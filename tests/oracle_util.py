"""Driver-style oracle comparison: run a registered PySpark query and its
DuckDB oracle SQL on the same parquet fixtures, then compare row count,
column-name set, and order-insensitive exact values (the same contract
the driver's value-hash enforces)."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from chess_pos_db_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    return con


def _norm_value(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_value(v.item())
    return v


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_norm_value(r[i]) for i in idx) for r in rows]
    canon.sort(key=repr)
    return canon


def compare(spark_df, con, sql: str, name: str):
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _canon_rows(spark_cols, spark_rows)
    d = _canon_rows(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, (
        f"{name}: value mismatch ({len(mismatches)}/{len(s)} rows); "
        f"first: spark={mismatches[0][0]!r} duck={mismatches[0][1]!r}"
    )
