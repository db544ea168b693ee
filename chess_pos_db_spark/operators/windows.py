"""Window-function operators (SURVEY.md §2.5, W1–W7).

W1 (lag) is how the reference's import derives the reverse move: the
entry for position i carries the move out of position i−1, a sequential
lag over ply order within a game (`Database::import` per-game walk).
Here `l_orderkey` plays game_id and `l_linenumber` plays ply.

All windows partition by a key with bounded group size, so state per
window fits executor memory at any scale; orderings always carry a
unique tie-break column so results are deterministic for oracle
hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t


# W1 — lag/lead over ply order (reverse-move derivation).
@register(
    "win_lag_lead",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       LAG(l_quantity)  OVER w AS prev_qty,
       LEAD(l_quantity) OVER w AS next_qty
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # l_linenumber alone is not unique within an order at sf>=0.01; the
    # extra keys make the ordering total so lag/lead are deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
    )


# W2 — row_number (monotonic id assignment ≈ game index from header append
# order; deterministic order via (date, orderkey) tie-break).
@register(
    "win_row_number",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS INT) AS seq
FROM orders
""",
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).alias("seq")
    )


# W3 — rank / dense_rank (move-popularity ranking in the explorer).
@register(
    "win_rank",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
       CAST(RANK()       OVER w AS INT) AS qty_rank,
       CAST(DENSE_RANK() OVER w AS INT) AS qty_dense_rank
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.rank().over(w).alias("qty_rank"),
        F.dense_rank().over(w).alias("qty_dense_rank"),
    )


# W4 — top-K per group (best K child moves per position in the explorer).
@register(
    "win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
)
WHERE rn <= 3
""",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# W5 — first/last value per partition (first/last game per position,
# window formulation of A3's min_by/max_by).
@register(
    "win_first_last",
    oracle="""
SELECT DISTINCT l_orderkey,
       FIRST_VALUE(l_quantity) OVER w AS first_qty,
       LAST_VALUE(l_quantity)  OVER w AS last_qty
FROM lineitem
WINDOW w AS (
    PARTITION BY l_orderkey
    ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w).alias("last_qty"),
    ).distinct()


# W6 — running totals with an explicit frame (cumulative counts over time).
@register(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_spend
FROM orders
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


# W7 — ntile / percent_rank (Elo percentile buckets, north-star gap-fill).
@register(
    "win_ntile",
    oracle="""
SELECT c_custkey,
       CAST(NTILE(4) OVER w AS INT)      AS balance_quartile,
       ROUND(PERCENT_RANK() OVER w, 6)   AS balance_pct_rank
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile/percent_rank WITHOUT a single-partition window.

    A bare ``Window.orderBy(...)`` funnels the whole table through ONE
    task — fine at sf0.1, a hard single-executor wall at 100×. Instead:
    the two-pass zipWithIndex pattern (SURVEY W2): range-partition on
    the sort key, rank WITHIN each range partition (parallel windows,
    one group per partition), then add per-partition row-count offsets —
    metadata, one long per partition — collected driver-side. The
    ordering key (c_acctbal, c_custkey) is unique, so rank ≡ row_number
    and NTILE/PERCENT_RANK are pure arithmetic on the global rank:
      ntile(n):     q, r = divmod(N, n); first r buckets get q+1 rows
      percent_rank: (rank-1) / (N-1)
    The localCheckpoint pins the sampled range boundaries so the counts
    job and the final job see the SAME partitioning (repartitionByRange
    re-samples per action otherwise).
    """
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    parts = (
        c.repartitionByRange(n_parts, "c_acctbal", "c_custkey")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in parts.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):  # range partitions are ordered by pid
        offsets[pid] = acc
        acc += counts[pid]
    off_df = parts.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()], "pid int, off bigint"
    )

    w_local = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    rn = (F.col("off") + F.row_number().over(w_local)).alias("rn")
    ranked = parts.join(F.broadcast(off_df), "pid").select("c_custkey", rn)

    n = 4
    q, r = divmod(total, n)
    big = r * (q + 1)  # rows living in the (q+1)-sized leading buckets
    if q > 0:
        # Integer `div` keeps the bucket arithmetic exact (double
        # division + truncation can be off by one at large ranks).
        quartile = (
            F.when(F.col("rn") <= big, F.expr(f"(rn - 1) div {q + 1}"))
            .otherwise(F.lit(r) + F.expr(f"(rn - {big} - 1) div {q}"))
            .cast("int")
            + 1
        )
    else:  # fewer rows than buckets: bucket i gets row i
        quartile = F.col("rn").cast("int")
    pct = (
        F.lit(0.0) if total <= 1
        else (F.col("rn") - 1) / F.lit(float(total - 1))
    )
    return ranked.select(
        "c_custkey",
        quartile.alias("balance_quartile"),
        F.round(pct, 6).alias("balance_pct_rank"),
    )
