"""TPC-H battery, part 2 — the remaining 14 classic queries adapted to
the fixture's slimmed schemas. The fixture has NO partsupp table and no
commitdate/receiptdate/shipmode/phone/container/comment columns, so
each query keeps its characteristic PLAN SHAPE (the thing a query
engine is graded on) while sourcing the missing attribute from what the
fixtures do have:

- partsupp-derived queries (q2, q11, q16, q20): supplier×part facts are
  derived from lineitem — supply cost = min unit price ever charged,
  available qty = total qty shipped. Same correlated-min / scalar-
  threshold / distinct-count / nested-IN shapes as the originals.
- lateness (q12, q21): shipdate vs orderdate + interval, as tpch.py's
  q4 established.
- q22's phone country code → c_nationkey % 10.

Cross-engine float discipline (see registry.py and tpch.py): money
sums are rounded at their true decimal precision; every ratio or
threshold derived from an accumulated sum is computed FROM THE ROUNDED
sum, so both engines divide/compare bit-identical doubles and the
comparison can never flip on summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t
from .tpch import _rev  # ONE revenue-expression definition for the battery


# Φ-Q2 — minimum-cost supplier. The original's correlated MIN subquery
# over partsupp becomes a correlated MIN over the lineitem-derived
# (part, supplier) unit-cost fact; the join-back-on-min shape (agg →
# min-per-key → equality join) is identical. Unit cost is a single
# IEEE division of parquet doubles — bit-identical in both engines, so
# the MIN-equality predicate cannot flip.
@register(
    "tpch_q2",
    oracle="""
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
    SELECT s_suppkey, s_acctbal, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
costed AS (
    SELECT p_partkey, p_name, s_acctbal, s_name, n_name, ps_supplycost,
           MIN(ps_supplycost) OVER (PARTITION BY p_partkey) AS min_cost
    FROM part
    JOIN ps ON p_partkey = ps_partkey
    JOIN eu ON ps_suppkey = s_suppkey
    WHERE p_size = 15 AND p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM costed
WHERE ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        )
    )
    eu = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    costed = (
        p.join(ps, F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "min_cost",
            F.min("ps_supplycost").over(Window.partitionBy("p_partkey")),
        )
    )
    return (
        costed.filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


# Φ-Q7 — volume shipping between two nations, both directions; the
# double-dim join where the supplier nation and customer nation come
# from DIFFERENT branches of the join tree.
@register(
    "tpch_q7",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 4) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


# Φ-Q8 — national market share: conditional-share-of-total by year.
# Both sums are rounded at true precision (1e-4) BEFORE the division so
# the ratio divides bit-identical doubles in both engines.
@register(
    "tpch_q8",
    oracle="""
SELECT o_year,
       ROUND(ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END), 4)
             / ROUND(SUM(volume), 4), 6) AS mkt_share
FROM (
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
""",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("volume")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.round(
                    F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(0.0)),
                    4,
                )
                / F.round(F.sum(vol), 4),
                6,
            ).alias("mkt_share")
        )
    )


# Φ-Q9 — product-type profit. No ps_supplycost in the fixture: cost is
# half the catalog price per unit (0.5 × p_retailprice × l_quantity) —
# an exact multiple of 5e-3, so profit stays 1e-4-exact and ROUND(,4)
# is at true precision. Plan shape (5-way join + LIKE filter + two-key
# agg) matches the original.
@register(
    "tpch_q9",
    oracle="""
SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
FROM (
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice * (1 - l_discount)
             - 0.5 * p_retailprice * l_quantity AS amount
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    amount = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
    )


# Φ-Q11 — important stock. partsupp value → lineitem revenue per part
# for one nation's suppliers; the original's scalar-subquery threshold
# (group value > fraction of the grand total) is kept: the grand total
# is a one-row aggregate broadcast into the HAVING. Both sides of the
# comparison derive from ROUNDed sums.
@register(
    "tpch_q11",
    oracle="""
WITH v AS (
    SELECT l_partkey AS ps_partkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
)
SELECT ps_partkey, value
FROM v
WHERE value > (SELECT ROUND(SUM(value), 4) * 0.001 FROM v)
ORDER BY value DESC, ps_partkey
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.round(F.sum(_rev()), 4).alias("value"))
    )
    total = v.agg(
        (F.round(F.sum("value"), 4) * 0.001).alias("threshold")
    )
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


# Φ-Q12 — shipping-priority lateness. No l_shipmode: the original's
# two-bucket split (MAIL vs SHIP) becomes two lateness buckets, and the
# high/low conditional line counts by order priority are unchanged.
@register(
    "tpch_q12",
    oracle="""
SELECT late_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
    SELECT o_orderpriority,
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'VERY_LATE' ELSE 'LATE' END AS late_bucket
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >  o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
) lines
GROUP BY late_bucket
""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    joined = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.select(
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("VERY_LATE"),
            )
            .otherwise(F.lit("LATE"))
            .alias("late_bucket"),
            F.when(high, 1).otherwise(0).alias("is_high"),
            # low mirrors the oracle's CASE WHEN pri NOT IN (...): for
            # a NULL priority, NOT IN is NULL -> counts as NEITHER.
            # 1 - is_high would count the NULL row as low — a latent
            # engine/oracle divergence on NULL-priority data.
            F.when(~high, 1).otherwise(0).alias("is_low"),
        )
        .groupBy("late_bucket")
        .agg(
            F.sum("is_high").cast("long").alias("high_line_count"),
            F.sum("is_low").cast("long").alias("low_line_count"),
        )
    )


# Φ-Q13 — customer order-count distribution: LEFT OUTER join keeping
# zero-order customers, then a histogram of the per-customer counts
# (two-level aggregation). The original's comment NOT LIKE filter
# becomes a priority filter on the orders side of the outer join.
@register(
    "tpch_q13",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer
    LEFT OUTER JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# Φ-Q15 — top supplier: the revenue view + scalar MAX subquery +
# equality join-back. Revenue is rounded at true precision so the MAX
# equality compares identical doubles.
@register(
    "tpch_q15",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 4).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# Φ-Q16 — supplier count by part attributes. partsupp → distinct
# (partkey, suppkey) pairs observed in lineitem; the original's
# complaint-supplier NOT IN subquery becomes a negative-balance
# supplier exclusion. Distinct-count + anti-subquery shape preserved.
@register(
    "tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
    )


# Φ-Q17 — small-quantity-order revenue: the correlated per-part average
# quantity subquery. avg_yearly divides a ROUNDed sum by the constant
# 7, so both engines divide bit-identical doubles; the 0.2×avg(qty)
# threshold likewise derives from exact integer sums and counts.
@register(
    "tpch_q17",
    oracle="""
WITH pq AS (
    SELECT l_partkey AS avg_pk,
           0.2 * (SUM(l_quantity) / COUNT(*)) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l_extendedprice), 2) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq   ON avg_pk = l_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < qty_threshold
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # integer-valued quantities: SUM and COUNT are exact in double, so
    # the division and 0.2× scale are bit-identical across engines.
    pq = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (0.2 * (F.sum("l_quantity") / F.count("*"))).alias("qty_threshold")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("avg_pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.round(F.sum("l_extendedprice"), 2) / 7.0).alias("avg_yearly")
        )
    )


# Φ-Q19 — discounted revenue: the three-branch disjunctive join
# predicate (brand × size-range × quantity-range). Catalyst pushes the
# common l_partkey = p_partkey conjunct into the join key and leaves
# the OR as a post-join filter — the exact behavior the original
# benchmarks.
@register(
    "tpch_q19",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            branch("Brand#1", 5, 1, 11)
            | branch("Brand#2", 10, 10, 20)
            | branch("Brand#3", 15, 20, 30)
        )
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


# Φ-Q20 — potential part promotion: the nested-IN shape. Suppliers in
# one nation that moved more than 50 units of some 'red' part in 1996
# (lineitem stands in for partsupp availability; integer quantity sums
# keep the HAVING threshold exact).
@register(
    "tpch_q20",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 50
  )
ORDER BY s_name
""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    movers = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(movers),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# Φ-Q21 — suppliers who kept orders waiting: the EXISTS + NOT-EXISTS
# double-correlation on the same fact table. "Late" = shipped more than
# 60 days after ordering (q4's adaptation); the supplier must be the
# ONLY late supplier on a multi-supplier order.
@register(
    "tpch_q21",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_4'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")

    l1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    # l2: any other supplier on the same order (semi) — probe the full
    # lineitem; l3: any OTHER LATE supplier on the same order (anti).
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey"))
            & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("k3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# Φ-Q22 — global sales opportunity: scalar-average subquery + anti-join
# against orders. Phone country code → c_nationkey % 10. The average
# threshold divides a ROUNDed sum by an exact count, so the acctbal
# comparison uses a bit-identical threshold in both engines. The
# fixture has no order-less customers at sf0.01, so the NOT-EXISTS is
# against URGENT orders (same anti-join shape, non-empty result).
@register(
    "tpch_q22",
    oracle="""
WITH pos AS (
    SELECT ROUND(SUM(c_acctbal), 2) / COUNT(*) AS avg_bal
    FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 3, 5, 7)
)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM (
    SELECT c_nationkey % 10 AS cntrycode, c_acctbal
    FROM customer, pos
    WHERE c_nationkey % 10 IN (1, 3, 5, 7)
      AND c_acctbal > avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 10
    )
    in_codes = c.filter(F.col("cntrycode").isin(1, 3, 5, 7))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0.0).agg(
        (F.round(F.sum("c_acctbal"), 2) / F.count("*")).alias("avg_bal")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        in_codes.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
