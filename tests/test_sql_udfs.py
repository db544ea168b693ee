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


def test_grouped_map_normalize_null_domain():
    """Zero-variance (or single-row) groups must yield NULL norm_value
    like SQL division by zero/NULL — never inf/NaN — and the rounding
    is half-away-from-zero like SQL ROUND, not pandas half-to-even."""
    import pandas as pd

    from chess_pos_db_spark.functions.udfs import _normalize

    flat = pd.DataFrame(
        {"event_id": [1, 2], "event_type": ["a", "a"], "value": [5.0, 5.0]}
    )
    assert _normalize(flat)["norm_value"].isna().all()
    single = pd.DataFrame(
        {"event_id": [1], "event_type": ["a"], "value": [5.0]}
    )
    assert _normalize(single)["norm_value"].isna().all()


def test_clamp_udf_null_propagates():
    """A NULL input must stay NULL (the oracle spells the same out with
    CASE); without the guard max(None, 10.0) raises TypeError and the
    whole task fails."""
    from chess_pos_db_spark.functions.udfs import _clamp_py

    assert _clamp_py(None) is None
    assert _clamp_py(5.0) == 10.0
    assert _clamp_py(50.0) == 40.0
    assert _clamp_py(25.0) == 25.0


def test_events_anomaly_zero_variance_type(spark, sf_dir, tmp_path):
    """A zero-variance event_type (stddev 0) must not blow up the whole
    query under Spark 4's default ANSI mode — the z divides via
    try_divide and those rows carry NULL, exactly like the oracle."""
    import chess_pos_db_spark as engine
    from chess_pos_db_spark.tables import t
    from pyspark.sql import functions as F

    e = t(spark, sf_dir, "events")
    flat = e.withColumn(
        "value",
        F.when(F.col("event_type") == e.select("event_type").first()[0], 1.0)
        .otherwise(F.col("value")),
    )
    flat.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    rows = engine.get_queries()["events_anomaly"](spark, str(tmp_path)).collect()
    assert len(rows) == 10  # ran to completion, no DIVIDE_BY_ZERO


def test_chess_udfs_null_in_null_out(spark):
    """Every registered chess UDF propagates SQL NULL instead of
    failing the task with a raw AttributeError/TypeError deep in the
    parser (round-13 sweep finding): one NULL fen in a batch must not
    kill the million-row scan around it. Malformed NON-null input
    stays loud (validation-by-parsing), except _san_line_fen whose
    documented contract maps illegal lines to NULL."""
    from chess_pos_db_spark.chess.sql_udfs import register_chess_udfs

    register_chess_udfs(spark)
    row = spark.sql(
        """
        SELECT fen_key(CAST(NULL AS STRING))        AS k,
               fen_compress(CAST(NULL AS STRING))   AS c,
               decompress_fen(CAST(NULL AS BINARY)) AS d,
               san_line_fen(CAST(NULL AS STRING))   AS s,
               eco_code(CAST(NULL AS STRING))       AS e
        """
    ).first()
    assert all(row[x] is None for x in ("k", "c", "d", "s", "e"))
    # mixed batch: NULLs coexist with real values in one Arrow batch
    start = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"
    got = spark.createDataFrame(
        [(start,), (None,), (start,)], "fen string"
    ).selectExpr("fen_key(fen) AS k").collect()
    assert got[0]["k"] == got[2]["k"] and got[0]["k"] is not None
    assert got[1]["k"] is None
