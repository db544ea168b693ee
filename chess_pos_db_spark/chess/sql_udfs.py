"""Chess scalar functions registered into the Spark SQL function
registry — the domain layer reachable from the SQL front-end, e.g.

    SELECT fen_key('rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1')

(the reference compiles these in; a generic engine exposes them as
UDFs). All are edge-path functions (probe-set preparation, dump
formatting) — never applied to the billion-row fact table, whose keys
are computed once at import.

Vectorized where the work is per-string (pandas_udf, Arrow-batched).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .board import Position
from .eco import OPENINGS

_START = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"


def _eco_lookup() -> dict[int, tuple[str, int]]:
    """pos_key → (eco code, ply) for the canonical opening lines; built
    once per process (workers rebuild on import — ~26 short replays)."""
    table: dict[int, tuple[str, int]] = {}
    for code, _name, line in OPENINGS:
        pos = Position.from_fen(_START)
        sans = line.split() if line else []
        for san in sans:
            pos = pos.make_move(pos.parse_san(san))
        table[pos.key()] = (code, len(sans))
    return table


_ECO_BY_KEY = _eco_lookup()


def classify_sans(sans: list[str]) -> tuple[str, int]:
    """Deepest ECO-table position visited by the line (transposition-
    invariant, same rule as eco.classify_games)."""
    pos = Position.from_fen(_START)
    best = ("A00", 0)
    hit = _ECO_BY_KEY.get(pos.key())
    if hit and hit[1] >= best[1]:
        best = hit
    for san in sans:
        try:
            pos = pos.make_move(pos.parse_san(san))
        except ValueError:
            break
        hit = _ECO_BY_KEY.get(pos.key())
        if hit and hit[1] >= best[1]:
            best = hit
    return best


# NULL-in → NULL-out on every UDF (the SQL scalar-function contract):
# pandas delivers SQL NULLs as None, and an unguarded .map dies deep in
# the parser with a raw AttributeError/TypeError that fails the WHOLE
# task — a NULL fen in one row killing a million-row batch is the
# opposite of the malformed-row discipline. MALFORMED non-null input
# stays LOUD (from_fen raises) — that is validation-by-parsing, and the
# one function sold as validation (_san_line_fen) maps it to NULL
# explicitly.


@pandas_udf(T.LongType())
def _fen_key(fens: pd.Series) -> pd.Series:
    return fens.map(lambda f: None if f is None else Position.from_fen(f).key())


@pandas_udf(T.BinaryType())
def _fen_compress(fens: pd.Series) -> pd.Series:
    return fens.map(
        lambda f: None if f is None else Position.from_fen(f).compress()
    )


@pandas_udf(T.StringType())
def _decompress_fen(blobs: pd.Series) -> pd.Series:
    return blobs.map(
        lambda b: None if b is None else Position.decompress(bytes(b)).fen()
    )


@pandas_udf(T.StringType())
def _san_line_fen(sans: pd.Series) -> pd.Series:
    """Space-separated SAN line from the start position → resulting FEN
    (NULL on illegal lines — validation-by-parsing)."""

    def run(line):
        if line is None:
            return None
        pos = Position.from_fen(
            "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"
        )
        try:
            for san in line.split():
                pos = pos.make_move(pos.parse_san(san))
        except ValueError:
            return None
        return pos.fen()

    return sans.map(run)


@pandas_udf(T.StringType())
def _eco_code(sans: pd.Series) -> pd.Series:
    return sans.map(
        lambda line: None if line is None else classify_sans(line.split())[0]
    )


def register_chess_udfs(spark: SparkSession) -> None:
    """Idempotently register the chess function suite for SQL use."""
    spark.udf.register("fen_key", _fen_key)
    spark.udf.register("fen_compress", _fen_compress)
    spark.udf.register("decompress_fen", _decompress_fen)
    spark.udf.register("san_line_fen", _san_line_fen)
    spark.udf.register("eco_code", _eco_code)
