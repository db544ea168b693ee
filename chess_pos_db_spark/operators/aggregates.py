"""Aggregation operators (SURVEY.md §2.4, A1–A10).

The reference's core computation is a grouped count over
(pos_key, level, result) accumulated across sorted runs
(chess_pos_db: format `executeQuery` accumulate loops; import buffer
combine). Spark's partial→final HashAggregate reproduces the
partial-aggregation-then-merge structure automatically; at 100 TB the
map-side combine keeps the shuffle proportional to group cardinality,
not row count.

Oracle notes: DuckDB SUM(INTEGER)→HUGEINT so integer sums are CAST to
BIGINT; double aggregates are rounded identically on both sides so
float summation order cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t


# ---------------------------------------------------------------------------
# A1 — flagship grouped multi-aggregate (TPC-H Q1 shape).
# chess analogue: count games per (pos_key, level, result) with payload sums.
# ---------------------------------------------------------------------------
@register(
    "agg_groupcount",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT)                              AS cnt,
       ROUND(SUM(l_quantity), 2)                             AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                        AS sum_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)     AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                             AS avg_qty,
       ROUND(AVG(l_discount), 4)                             AS avg_disc
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_groupcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )


# ---------------------------------------------------------------------------
# A2 — two-level aggregation (pre-aggregate then re-aggregate), mirroring the
# reference's in-buffer combine before spill + re-combine during merge.
# ---------------------------------------------------------------------------
@register(
    "agg_twolevel",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(cnt) AS BIGINT)  AS total_cnt,
       CAST(COUNT(*) AS BIGINT)  AS n_groups
FROM (
    SELECT l_returnflag, l_linestatus, l_orderkey % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, l_orderkey % 10
)
GROUP BY l_returnflag
""",
)
def agg_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pre = li.groupBy(
        "l_returnflag", "l_linestatus", (F.col("l_orderkey") % 10).alias("bucket")
    ).agg(F.count("*").alias("cnt"))
    return pre.groupBy("l_returnflag").agg(
        F.sum("cnt").alias("total_cnt"), F.count("*").alias("n_groups")
    )


# ---------------------------------------------------------------------------
# A3 — min/max with payload (first/last game per position in the reference:
# beta/delta entry merge keeps first_game_id/last_game_id).
# ---------------------------------------------------------------------------
@register(
    "agg_minmax_by",
    oracle="""
SELECT o_orderpriority,
       MIN(o_orderdate)                       AS first_date,
       MAX(o_orderdate)                       AS last_date,
       -- ordering value made UNIQUE (price-in-cents scaled + key):
       -- min_by/max_by tie-breaks on a bare price are engine-defined.
       -- The CASE arms fail LOUDLY if either component outgrows its
       -- field (orderkey >= multiplier would bleed into the price
       -- component; cents >= 92e6 would overflow int64) instead of
       -- silently picking a wrong order at large scale factors.
       CAST(MIN_BY(o_orderkey,
                   CASE WHEN o_orderkey >= 100000000000
                          OR CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 92000000
                        THEN CAST(error('agg_minmax_by ordering encoding overflow') AS BIGINT)
                        ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100000000000
                             + o_orderkey END) AS BIGINT) AS cheapest_order,
       CAST(MAX_BY(o_orderkey,
                   CASE WHEN o_orderkey >= 100000000000
                          OR CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 92000000
                        THEN CAST(error('agg_minmax_by ordering encoding overflow') AS BIGINT)
                        ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100000000000
                             + o_orderkey END) AS BIGINT) AS priciest_order
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The ordering value is a UNIQUE bigint (price in cents scaled, key
    # as tie-break): min_by/max_by with a bare price leave price-tied
    # groups to an engine-defined pick, which can never hash-match a
    # second engine (same discipline as agg_mode / the windows module).
    # Struct ordering would be cleaner but DuckDB's MIN_BY rejects a
    # composite ordering value, so the encoding is a field-packed
    # bigint with a loud in-plan overflow guard: orderkey must stay
    # below the 1e11 multiplier (holds to TPC-H sf ~16k) and cents
    # below 92e6 (int64 headroom) — raise_error instead of a silently
    # wrong pick if either field ever outgrows its slot.
    o = t(spark, sf_dir, "orders")
    _MULT = 100_000_000_000
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ordv = F.when(
        (F.col("o_orderkey") >= _MULT) | (cents >= 92_000_000),
        F.raise_error(F.lit("agg_minmax_by ordering encoding overflow")),
    ).otherwise(cents * _MULT + F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
        F.min_by("o_orderkey", ordv).alias("cheapest_order"),
        F.max_by("o_orderkey", ordv).alias("priciest_order"),
    )


# ---------------------------------------------------------------------------
# A4 — sum / average (elo_diff_sum per group in the reference).
# ---------------------------------------------------------------------------
@register(
    "agg_sum_avg",
    oracle="""
SELECT o_orderstatus,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       ROUND(AVG(o_totalprice), 4) AS avg_price,
       CAST(COUNT(*) AS BIGINT)    AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# A5 — one-pass multi-aggregate struct {cnt, sum, min, max, distinct} per
# group (reference: single entry-combine pass computing all payload fields).
# ---------------------------------------------------------------------------
@register(
    "agg_multi",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT)                 AS cnt,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       ROUND(SUM(l_extendedprice), 2)           AS sum_price,
       ROUND(MIN(l_extendedprice), 2)           AS min_price,
       ROUND(MAX(l_extendedprice), 2)           AS max_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


# ---------------------------------------------------------------------------
# A6 — distinct count (games vs positions totals in DB stats) + approximate
# variant for 100 TB (HLL sketch; rows-only check, DuckDB's approx differs).
# ---------------------------------------------------------------------------
@register(
    "agg_distinct",
    oracle="""
SELECT l_linestatus,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register("agg_approx_distinct")  # rows-only: HLL sketch not oracle-reproducible
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


# ---------------------------------------------------------------------------
# A7 — HAVING (reference: dump's min-count threshold, emit only positions
# with cnt >= N).
# ---------------------------------------------------------------------------
@register(
    "agg_having",
    oracle="""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(COUNT(*) AS BIGINT)  AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 10
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 10)
    )


# ---------------------------------------------------------------------------
# A8 — rollup / cube (reference: the response always materializes the
# (level×result) grid including margin totals — rollup semantics).
# ---------------------------------------------------------------------------
@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# A9 — derived win-rate metrics via conditional aggregation (reference GUI
# computes win%/draw% from the (level,result) grid client-side; in-engine
# here as conditional sums).
# ---------------------------------------------------------------------------
@register(
    "agg_pivot_rates",
    oracle="""
SELECT l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
           AS return_rate,
       ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 2)
           AS qty_a
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_pivot_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("return_rate"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "A", F.col("l_quantity")).otherwise(0)),
            2,
        ).alias("qty_a"),
    )


# ---------------------------------------------------------------------------
# A10 — pivot: the (level×result) grid as wide columns, which is exactly the
# JSON response shape of the reference's query command.
# ---------------------------------------------------------------------------
@register(
    "agg_pivot",
    oracle="""
SELECT l_linestatus,
       ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
       ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv
