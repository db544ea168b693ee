"""Partition-column layout (SURVEY.md §4 Φ10 — the reference's format
alpha physically partitions entries 9-ways by (level,result) and scans
only the requested partitions). Spark analogue: partitionBy on write +
static/dynamic partition pruning on read."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chess_pos_db_spark.tables import t


@pytest.fixture(scope="module")
def partitioned_lineitem(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "li")
    t(spark, sf_dir, "lineitem").write.partitionBy(
        "l_returnflag", "l_linestatus"
    ).parquet(path)
    return path


def test_static_partition_pruning(spark, sf_dir, partitioned_lineitem):
    df = spark.read.parquet(partitioned_lineitem).filter(
        (F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter must land in PartitionFilters (scan prunes directories),
    # not in a post-scan Filter
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters")[1][:400]
    got = df.count()
    want = (
        t(spark, sf_dir, "lineitem")
        .filter("l_returnflag = 'A' AND l_linestatus = 'F'")
        .count()
    )
    assert got == want


def test_dynamic_partition_pruning(spark, partitioned_lineitem, tmp_path):
    """Join against a filtered dim on the partition column → the fact
    scan receives a runtime (dynamic) pruning filter."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(partitioned_lineitem)
    dim = spark.createDataFrame(
        [("A", "keep")], ["flag", "tag"]
    ).filter(F.col("tag") == "keep")
    joined = fact.join(dim, fact.l_returnflag == dim.flag)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]
