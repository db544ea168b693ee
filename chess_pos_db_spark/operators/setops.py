"""Set operations (SURVEY.md §2.7, U1–U4).

U1 is the reference's read model: an open database IS a UNION ALL of
its sorted runs, summed at query time. intersect/except are gap-fills
(e.g. positions present in DB-A but not DB-B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t


# U1 — union-all of runs.
@register(
    "set_union_all",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_totalprice > 250000
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.filter(F.col("o_orderstatus") == "F").unionByName(
        o.filter(F.col("o_totalprice") > 250000)
    )


# U3a — intersect (distinct semantics on both engines).
@register(
    "set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


# U3b — except (distinct semantics on both engines).
@register(
    "set_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.subtract(p)


# U4 — distinct (dump of unique positions).
@register(
    "set_distinct",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
""",
)
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# U3c/U3d — bag-semantics intersect/except (multiplicities preserved:
# two runs containing the same entry twice keep both copies).
@register(
    "set_intersect_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersectAll(op)


@register(
    "set_except_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.exceptAll(op)
