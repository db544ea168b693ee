"""Layout/compaction job invariants (SURVEY.md §5.2.3):
union-then-agg over runs ≡ direct aggregation of the full input, and
the compacted output is key-clustered with a readable manifest."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chess_pos_db_spark.plans import layout
from chess_pos_db_spark.tables import t


@pytest.fixture(scope="module")
def entries(spark, sf_dir):
    # lineitem plays the entries fact: (partkey, returnflag) ≈
    # (pos_key, result); pre-aggregate per run like the import buffer.
    return t(spark, sf_dir, "lineitem")


def _agg(df):
    return df.groupBy("l_partkey", "l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.min("l_orderkey").alias("first_id"),
        F.max("l_orderkey").alias("last_id"),
    )


def test_compaction_equals_direct_agg(spark, entries, tmp_path):
    half1 = entries.filter(F.col("l_orderkey") % 2 == 0)
    half2 = entries.filter(F.col("l_orderkey") % 2 == 1)
    run1, run2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    out = str(tmp_path / "compacted")

    layout.write_sorted_run(_agg(half1), run1, key=["l_partkey", "l_returnflag"])
    layout.write_sorted_run(_agg(half2), run2, key=["l_partkey", "l_returnflag"])

    compacted = layout.compact_runs(
        spark,
        [run1, run2],
        out,
        key=["l_partkey", "l_returnflag"],
        agg_spec={"cnt": "sum", "first_id": "min", "last_id": "max"},
        partitions=4,
    )
    direct = _agg(entries)

    got = {tuple(r) for r in compacted.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want


def test_manifest_roundtrip(spark, entries, tmp_path):
    path = str(tmp_path / "run")
    layout.write_sorted_run(_agg(entries), path, key=["l_partkey", "l_returnflag"])
    m = layout.read_manifest(path)
    assert m["format"] == layout.FORMAT_NAME
    assert m["sort_key"] == ["l_partkey", "l_returnflag"]


def test_sorted_run_is_key_clustered(spark, entries, tmp_path):
    """Each parquet file of a sorted run covers a disjoint-ish key range
    (range partitioning), and rows inside a partition are key-sorted —
    the property that makes row-group stats act as the sparse index."""
    path = str(tmp_path / "run")
    layout.write_sorted_run(_agg(entries), path, key=["l_partkey"], partitions=4)
    df = spark.read.parquet(path)

    # within-file sortedness: compare per-input-file row order vs sorted.
    seq = df.select(
        "l_partkey", F.input_file_name().alias("f"), F.monotonically_increasing_id().alias("i")
    )
    rows = seq.collect()
    by_file: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r["i"]):
        by_file.setdefault(r["f"], []).append(r["l_partkey"])
    assert by_file, "no files written"
    for keys in by_file.values():
        assert keys == sorted(keys)
