"""Salted aggregation must be exactly equivalent to the direct
aggregation — on skewed data (one dominant key, like the chess start
position)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chess_pos_db_spark.plans.skew import salted_agg
from chess_pos_db_spark.tables import t


def test_salted_agg_equivalence(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # manufacture skew: fold most keys into one hot key
    skewed = li.withColumn(
        "k", F.when(F.col("l_orderkey") % 4 != 0, F.lit(0)).otherwise(F.col("l_orderkey"))
    )
    spec = {
        "cnt": ("count", "l_quantity"),
        "sum_qty": ("sum", "l_quantity"),
        "min_ok": ("min", "l_orderkey"),
        "max_ok": ("max", "l_orderkey"),
    }
    got = salted_agg(skewed, ["k"], spec, salt_buckets=8)
    want = skewed.groupBy("k").agg(
        F.count("l_quantity").alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_orderkey").alias("min_ok"),
        F.max("l_orderkey").alias("max_ok"),
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_salt_actually_spreads(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").withColumn("k", F.lit(1))
    # phase-1 of the salted plan produces multiple rows for the hot key
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(8))
    phase1 = li.withColumn("_salt", salt).groupBy("k", "_salt").count()
    assert phase1.count() > 1


def test_salted_agg_rejects_salt_column_collision(spark, sf_dir):
    """An input that already carries a '_salt' column would be silently
    clobbered by the synthetic salt before phase 1 — any aggregate
    reading it would sum salt values instead of data. Refuse loudly."""
    import pytest

    li = t(spark, sf_dir, "lineitem").withColumn("_salt", F.lit(1))
    with pytest.raises(ValueError, match="_salt"):
        salted_agg(li, ["l_returnflag"], {"s": ("sum", "_salt")})
