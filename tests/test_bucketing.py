"""Bucketed-join plan tests: same-bucketed tables must join with no
shuffle Exchange (the 100 TB co-location strategy)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chess_pos_db_spark.plans import bucketing
from chess_pos_db_spark.tables import t


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("wh")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    bucketing.write_bucketed(
        li, "b_lineitem", ["l_orderkey"], buckets=8, path=str(warehouse / "li")
    )
    bucketing.write_bucketed(
        orders, "b_orders", ["l_orderkey"], buckets=8, path=str(warehouse / "o")
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketing.joined_without_shuffle(spark, lt, rt, ["l_orderkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketing.joined_without_shuffle(spark, lt, rt, ["l_orderkey"])
    got = joined.count()
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    want = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert got == want


def test_bucketed_join_key_not_ambiguous(spark, bucketed_tables):
    """on=list(key) must deduplicate the key columns: selecting the
    join key from the result used to raise AMBIGUOUS_REFERENCE because
    the expression-condition form kept both sides' copies."""
    lt, rt = bucketed_tables
    joined = bucketing.joined_without_shuffle(spark, lt, rt, ["l_orderkey"])
    assert joined.columns.count("l_orderkey") == 1
    assert joined.select("l_orderkey").count() == joined.count()
