"""Sort / limit / compaction operators (SURVEY.md §2.6, O1–O3).

O1/O2 are the reference's storage engine: external merge sort of entry
buffers into sorted runs (`ext::sort`) and the k-way aggregate-combining
merge of runs (`ext::Merger` + the `merge` command). In Spark the
external sort is the shuffle's problem; the k-way merge with equal-key
combining is exactly `UNION ALL → groupBy.agg` followed by a sorted
rewrite — see plans/layout.py for the physical compaction job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t


# O1 — global sort (observable through a deterministic LIMIT; the sort
# itself is a range-partitioned shuffle, Spark's external-sort analogue).
@register(
    "sort_global",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
ORDER BY l_shipdate, l_orderkey, l_linenumber
LIMIT 100
""",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .limit(100)
    )


# O2 — union of sorted runs + re-aggregation of equal keys (the `merge`
# command's combining k-way merge, expressed relationally).
@register(
    "sort_merge_compact",
    oracle="""
SELECT l_partkey,
       CAST(SUM(cnt) AS BIGINT) AS cnt,
       ROUND(SUM(sum_qty), 2)   AS sum_qty
FROM (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-06-01'
    GROUP BY l_partkey
    UNION ALL
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    GROUP BY l_partkey
)
GROUP BY l_partkey
""",
)
def sort_merge_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def run(pred) -> DataFrame:
        return (
            li.filter(pred)
            .groupBy("l_partkey")
            .agg(
                F.count("*").alias("cnt"),
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            )
        )

    cutoff = F.col("l_shipdate") < "1997-06-01"
    runs = run(cutoff).unionByName(run(~cutoff))
    return runs.groupBy("l_partkey").agg(
        F.sum("cnt").alias("cnt"),
        F.round(F.sum("sum_qty"), 2).alias("sum_qty"),
    )


# O3 — ORDER BY + LIMIT top-k (dump of most-common positions). Spark plans
# this as TakeOrderedAndProject: per-partition top-k, then a driver-side
# merge of k·P candidates — no global sort, which is what you want at
# 100 TB.
@register(
    "sort_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
