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


def test_write_bucketed_keeps_self_overwrite_guard(spark, sf_dir):
    """write_bucketed must NOT pre-drop a catalog-known target: the
    unconditional drop bypassed Spark's cannot-overwrite-a-table-
    being-read analysis guard, so writing a DataFrame derived from the
    target deleted its own input files mid-plan. A catalog-known table
    goes through plain mode=overwrite, which rejects the cycle."""
    from pyspark.errors import AnalysisException

    nat = t(spark, sf_dir, "nation")
    try:
        bucketing.write_bucketed(nat, "b_guard", ["n_nationkey"], buckets=4)
        derived = spark.table("b_guard").filter(F.col("n_nationkey") > 2)
        with pytest.raises(AnalysisException):
            bucketing.write_bucketed(
                derived, "b_guard", ["n_nationkey"], buckets=4
            )
        # the failed overwrite must not have destroyed the table
        assert spark.table("b_guard").count() == nat.count()
        # a genuine (non-self-referential) overwrite still works
        bucketing.write_bucketed(
            nat.limit(3), "b_guard", ["n_nationkey"], buckets=4
        )
        assert spark.table("b_guard").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS b_guard")


def test_clean_orphaned_location_scopes(spark, tmp_path):
    """Orphan cleanup only fires when the catalog does NOT know the
    table, and derives a db-qualified name's default location as
    <warehouse>/<db>.db/<table> (not <warehouse>/<db.table>)."""
    import os
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    # catalog-known table: left alone
    spark.range(3).write.mode("overwrite").saveAsTable("orph_known")
    try:
        assert bucketing.clean_orphaned_location(spark, "orph_known") is False
        assert spark.table("orph_known").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS orph_known")
    # orphaned db-qualified location: removed from the right path
    loc = os.path.join(wh, "orphdb.db", "orph_tbl")
    os.makedirs(loc, exist_ok=True)
    wrong = os.path.join(wh, "orphdb.orph_tbl")
    assert bucketing.clean_orphaned_location(spark, "orphdb.orph_tbl") is True
    assert not os.path.exists(loc)
    assert not os.path.exists(wrong)  # never touched the joined form


def test_bucketed_join_key_not_ambiguous(spark, bucketed_tables):
    """on=list(key) must deduplicate the key columns: selecting the
    join key from the result used to raise AMBIGUOUS_REFERENCE because
    the expression-condition form kept both sides' copies."""
    lt, rt = bucketed_tables
    joined = bucketing.joined_without_shuffle(spark, lt, rt, ["l_orderkey"])
    assert joined.columns.count("l_orderkey") == 1
    assert joined.select("l_orderkey").count() == joined.count()
