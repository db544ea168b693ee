"""ECO opening classification (reference: `src/chess/Eco.h` †,
SURVEY.md §2.8 F8).

Classification is by POSITION MEMBERSHIP, not by tag or move-prefix
string matching: the ECO table maps position keys (reached by the
canonical opening lines) to codes, and a game's classification is the
DEEPEST table position it visits. Transposed move orders therefore
classify identically — the property the whole engine is built around.

Spark shape: the ECO table is tiny (thousands of rows at full ECO) →
broadcast join against early-ply entries, then max_by(code, ply) per
game. No shuffle of the fact side beyond the groupBy on game_id.

The built-in table is a compact starter set (the full public ECO list
drops in as data, same schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .board import Position, START_FEN

# code, name, SAN line (space-separated)
OPENINGS: list[tuple[str, str, str]] = [
    ("A00", "Irregular Openings", ""),
    ("A04", "Réti Opening", "Nf3"),
    ("A10", "English Opening", "c4"),
    ("A40", "Queen's Pawn Game", "d4"),
    ("A45", "Indian Defence", "d4 Nf6"),
    ("A80", "Dutch Defence", "d4 f5"),
    ("B00", "King's Pawn Opening", "e4"),
    ("B01", "Scandinavian Defence", "e4 d5"),
    ("B02", "Alekhine's Defence", "e4 Nf6"),
    ("B10", "Caro-Kann Defence", "e4 c6"),
    ("B20", "Sicilian Defence", "e4 c5"),
    ("B27", "Sicilian: 2.Nf3", "e4 c5 Nf3"),
    ("B30", "Sicilian: 2...Nc6", "e4 c5 Nf3 Nc6"),
    ("B50", "Sicilian: 2...d6", "e4 c5 Nf3 d6"),
    ("C00", "French Defence", "e4 e6"),
    ("C20", "King's Pawn Game", "e4 e5"),
    ("C40", "King's Knight Opening", "e4 e5 Nf3"),
    ("C44", "King's Pawn: 2...Nc6", "e4 e5 Nf3 Nc6"),
    ("C60", "Ruy Lopez", "e4 e5 Nf3 Nc6 Bb5"),
    ("D00", "Queen's Pawn: 1...d5", "d4 d5"),
    ("D06", "Queen's Gambit", "d4 d5 c4"),
    ("D10", "Slav Defence", "d4 d5 c4 c6"),
    ("D30", "Queen's Gambit Declined", "d4 d5 c4 e6"),
    ("E00", "Indian: 2.c4", "d4 Nf6 c4"),
    ("E20", "Nimzo-Indian", "d4 Nf6 c4 e6 Nc3 Bb4"),
    ("E60", "King's Indian Defence", "d4 Nf6 c4 g6"),
]

ECO_SCHEMA = T.StructType(
    [
        T.StructField("pos_key", T.LongType(), False),
        T.StructField("eco", T.StringType(), False),
        T.StructField("opening", T.StringType(), False),
        T.StructField("eco_ply", T.IntegerType(), False),
    ]
)


def build_eco_table(spark: SparkSession) -> DataFrame:
    """Replay each canonical line driver-side → (pos_key, eco, name, ply)."""
    rows = []
    for code, name, line in OPENINGS:
        pos = Position.from_fen(START_FEN)
        sans = line.split() if line else []
        for san in sans:
            pos = pos.make_move(pos.parse_san(san))
        rows.append((pos.key(), code, name, len(sans)))
    return spark.createDataFrame(rows, ECO_SCHEMA)


def classify_games(entries: DataFrame, eco_table: DataFrame) -> DataFrame:
    """game_id → (eco, opening): the deepest ECO-table position the game
    visits within its first moves. Ply bound keeps the probe selective
    (openings are decided early; also prunes the scan)."""
    max_ply = 24
    probe = entries.filter(F.col("ply") <= max_ply).join(
        F.broadcast(eco_table), "pos_key"
    )
    # deepest matching table position wins; tie-break on code for
    # determinism (transpositions can hit two same-ply lines)
    return probe.groupBy("game_id").agg(
        F.max_by("eco", F.struct("eco_ply", "eco")).alias("eco"),
        F.max_by("opening", F.struct("eco_ply", "eco")).alias("opening"),
    )
