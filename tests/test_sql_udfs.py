"""Chess functions through the SQL front-end (the reference's
compiled-in chess primitives exposed as registered UDFs)."""

from __future__ import annotations

from chess_pos_db_spark.chess.board import Position, START_FEN
from chess_pos_db_spark.chess.sql_udfs import register_chess_udfs

RUY = "e4 e5 Nf3 Nc6 Bb5"


def test_fen_key_matches_python(spark):
    register_chess_udfs(spark)
    got = spark.sql(f"SELECT fen_key('{START_FEN}') AS k").first().k
    assert got == Position.from_fen(START_FEN).key()


def test_compress_roundtrip_sql(spark):
    register_chess_udfs(spark)
    row = spark.sql(
        f"SELECT decompress_fen(fen_compress('{START_FEN}')) AS fen"
    ).first()
    # compression keeps board/side/castling/ep; move counters reset
    assert row.fen.split()[:4] == START_FEN.split()[:4]


def test_san_line_and_eco(spark):
    register_chess_udfs(spark)
    row = spark.sql(
        f"SELECT san_line_fen('{RUY}') AS fen, eco_code('{RUY}') AS eco, "
        f"san_line_fen('e4 e4') AS bad"
    ).first()
    pos = Position.from_fen(START_FEN)
    for san in RUY.split():
        pos = pos.make_move(pos.parse_san(san))
    assert row.fen == pos.fen()
    assert row.eco == "C60"
    assert row.bad is None


def test_transposition_invariant_eco(spark):
    register_chess_udfs(spark)
    # Sicilian via 1.Nf3? No — use d4 Nf6 c4 vs c4 Nf6 d4 (both reach E00)
    a = spark.sql("SELECT eco_code('d4 Nf6 c4') AS e").first().e
    b = spark.sql("SELECT eco_code('c4 Nf6 d4') AS e").first().e
    assert a == b == "E00"
