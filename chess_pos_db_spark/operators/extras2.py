"""Coverage extensions, batch 2 (SURVEY.md §2 gap-fills): ordered-set
and boolean/bitwise aggregates, deterministic mode, linear-regression
aggregates, EXISTS / IN subqueries, and RANGE / sliding-ROWS window
frames.

All of these generalize reference shapes: the reference's entry-combine
is a multi-aggregate (A5); mode/median are "most common position /
median Elo" explorer statistics the GUI derives client-side
(SURVEY.md §2.4 A9 note); bitwise aggregates generalize the packed
reverse-move bit ops (F6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hashing import knuth_permille_sql
from ..registry import register
from ..tables import t


# --- median + deterministic mode ---------------------------------------------


@register(
    "agg_median",
    oracle="""
SELECT l_returnflag,
       ROUND(MEDIAN(l_quantity), 6)      AS qty_median,
       ROUND(MEDIAN(l_extendedprice), 6) AS price_median
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MEASURED AND REJECTED (round 13, do not retry): three exact-median
    # reformulations aimed at replacing the ObjectHashAggregate
    # partial_percentile map-merge — (1) counts + cumulative window per
    # column, (2) the same over a melted (flag, col, value) frame,
    # (3) row_number windows over raw rows with broadcast totals — all
    # LOST to the builtin under interleaved noop-sink A/B at sf0.1 on an
    # idle host: 0.861s builtin vs 1.15s (raw window, one exchange),
    # 1.19s (one-pass dual window), 2.6s (melt) and 3.7s (two counts
    # branches). The map-side partial percentile buffers are small here
    # (50 distinct l_quantity, ~18k distinct l_extendedprice per task),
    # so the single exchange + one-reducer merge beats every multi-stage
    # window plan whose extra AQE stages and single-task sorts dominate
    # at this data size. Harness: tools/ab_median.py (oracle-verified
    # equal on all variants). At true 100 TB the counts+window variant
    # bounds reducer state by DISTINCT values and would be revisited.
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("qty_median"),
        F.round(F.median("l_extendedprice"), 6).alias("price_median"),
    )


@register(
    "agg_mode",
    oracle="""
SELECT l_returnflag, l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS cnt
FROM (
    SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY COUNT(*) DESC, l_quantity) AS rn
    FROM lineitem
    GROUP BY l_returnflag, l_quantity
)
WHERE rn = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic mode: highest count, ties broken by smallest value.
    # (Built-in `F.mode` leaves tie-breaking engine-defined, which can
    # never hash-match a second engine — so the operator is expressed as
    # count + top-1 window in both engines instead.)
    li = t(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("l_quantity"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "cnt")
    )


# --- ordered-set string aggregation (listagg) --------------------------------


@register(
    "agg_listagg",
    oracle="""
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ordered-set aggregate: collect_set -> array_sort -> array_join is
    # the shuffle-friendly Spark formulation (set dedup happens map-side;
    # only distinct values cross the wire).
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("n_orders"),
    )


# --- boolean / conditional-count aggregates ----------------------------------


@register(
    "agg_bool_countif",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 0)   AS all_positive,
       bool_or(l_discount > 0.09) AS any_high_discount,
       CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
    )


# --- bitwise aggregates (generalize packed reverse-move bit ops, F6) ---------


@register(
    "agg_bitwise",
    oracle="""
SELECT l_orderkey,
       bit_and(l_linenumber) AS ln_and,
       bit_or(l_linenumber)  AS ln_or,
       bit_xor(l_linenumber) AS ln_xor
FROM lineitem
GROUP BY l_orderkey
""",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.bit_and("l_linenumber").alias("ln_and"),
        F.bit_or("l_linenumber").alias("ln_or"),
        F.bit_xor("l_linenumber").alias("ln_xor"),
    )


# --- linear-regression aggregates (Elo-trend statistics generalized) ---------


@register(
    "agg_regr",
    oracle="""
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


# --- EXISTS / IN subqueries (semi-join front-ends) ---------------------------


@register(
    "subquery_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
)
""",
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Catalyst rewrites correlated EXISTS to a left-semi join — same
    # physical plan as join_semi, different front-end.
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_v c
        WHERE EXISTS (
            SELECT 1 FROM orders_v o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
        )
        """
    )


@register(
    "subquery_in",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
""",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_v
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer_v WHERE c_mktsegment = 'MACHINERY'
        )
        """
    )


# --- RANGE frame + sliding ROWS frame windows --------------------------------


@register(
    "win_range_frame",
    oracle="""
SELECT o_orderkey,
       CAST(COUNT(*) OVER (
           PARTITION BY o_orderpriority ORDER BY o_orderkey
           RANGE BETWEEN 100 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_nearby
FROM orders
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE frame: peers are defined by value distance on the ORDER BY
    # key, not row position (the reference's key-window block scan, Φ2,
    # expressed as a frame).
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rangeBetween(-100, Window.currentRow)
    )
    return o.select("o_orderkey", F.count("*").over(w).alias("n_nearby"))


@register(
    "win_moving_avg",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(AVG(l_quantity) OVER (
           PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ), 6) AS qty_ma3
FROM lineitem
""",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf0.01+ fixtures have duplicate (l_orderkey, l_linenumber) pairs, so
    # the ordering adds l_quantity to make the frame contents (and hence
    # the moving average) deterministic.
    li = t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(-2, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 6).alias("qty_ma3"),
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch rollup (A6 scale path): per-group HyperLogLog
# sketches that UNION to coarser groups without a re-scan — the
# two-level pre-aggregation that makes distinct-count rollups feasible
# at 100 TB (sketches are ~KB constants per group crossing the shuffle;
# re-aggregating exact distincts would re-shuffle raw keys). Spark's
# hll_sketch_agg/hll_union_agg are Apache DataSketches HLL under the
# hood — engine-native binary, so the query is declared rows-only; the
# pytest gate checks both levels against exact distinct counts (±5%)
# and that the union path equals a direct whole-table sketch estimate.
# ---------------------------------------------------------------------------


@register("agg_hll_mergeable")  # rows-only: engine-native sketch values
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.count_distinct("l_orderkey").alias("exact_distinct"),
    )
    rolled = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
            "est_total_distinct"
        ),
        F.sum("exact_distinct").alias("sum_group_distinct"),
    )
    per = per_flag.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("est_distinct"),
        "exact_distinct",
    )
    return per.crossJoin(F.broadcast(rolled))


# ---------------------------------------------------------------------------
# Mergeable-quantile rollup (A6/W7 scale path): per-group KLL sketches
# that MERGE to coarser groups without a re-scan — the quantile
# counterpart of agg_hll_mergeable, and the 100 TB answer to
# agg_median's full-sort-per-group: a KLL sketch is a ~KB constant per
# group crossing the shuffle, and rollup levels (returnflag x
# linestatus -> returnflag -> grand total) come from sketch merges,
# never from re-shuffling raw values. Spark's kll_sketch_* are Apache
# DataSketches KLL — engine-native binary, so the query is rows-only;
# the pytest gate bounds the estimated median against the exact one by
# KLL's rank-error guarantee at this sketch size (k=200 -> ~1.65% rank
# error, so the estimate must land between the exact 46th and 54th
# percentiles).
# ---------------------------------------------------------------------------


@register("agg_kll_mergeable")  # rows-only: engine-native sketch values
def agg_kll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.kll_sketch_agg_double("l_quantity").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    # kll_sketch_merge_double is a binary scalar (two sketches -> one);
    # the rollup fan-in per group is tiny (|linestatus| sketches), so
    # collect_list + reduce is a constant-size merge, not a data move.
    def _merge(col):
        return F.reduce(
            F.expr(f"slice({col}, 2, size({col}) - 1)"),
            F.element_at(F.col(col), 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        )

    per_flag = fine.groupBy("l_returnflag").agg(
        F.collect_list("sk").alias("sks"),
        F.sum("n_rows").alias("n_rows"),
    ).select(
        "l_returnflag", _merge("sks").alias("sk"), "n_rows"
    )
    total = per_flag.agg(
        F.collect_list("sk").alias("sks"),
        F.sum("n_rows").alias("total_rows"),
    ).select(
        F.kll_sketch_get_quantile_double(
            _merge("sks"), F.lit(0.5)
        ).alias("est_total_median"),
        "total_rows",
    )
    per = per_flag.select(
        "l_returnflag",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("est_median"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("est_p90"),
        "n_rows",
    )
    return per.crossJoin(F.broadcast(total))


# --- fixed-bin numeric histogram ---------------------------------------------
# Fixed (not data-dependent) bin edges keep the operator ONE map-only
# bucket computation + one partial-agg shuffle of (bin, count) rows —
# the same posture as the flagship grid agg; a data-dependent range
# would need a pre-pass. Empty bins are absent (sparse histogram), which
# is the scale-safe contract: materializing 0-rows for all bins is a
# driver-side cosmetic join over the literal bin table.

_HIST_LO = 0.0
_HIST_W = 25000.0  # o_totalprice bin width
_HIST_NBINS = 24


@register(
    "agg_histogram",
    oracle=f"""
SELECT CAST(LEAST(FLOOR((o_totalprice - {_HIST_LO}) / {_HIST_W}),
                  {_HIST_NBINS - 1}) AS BIGINT) AS bin_idx,
       ROUND({_HIST_LO} + LEAST(FLOOR((o_totalprice - {_HIST_LO}) / {_HIST_W}),
                                {_HIST_NBINS - 1}) * {_HIST_W}, 2) AS lo_edge,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY 1, 2
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    bin_idx = F.least(
        F.floor((F.col("o_totalprice") - _HIST_LO) / _HIST_W),
        F.lit(_HIST_NBINS - 1),
    ).cast("long")
    return (
        o.select(
            bin_idx.alias("bin_idx"),
            F.round(_HIST_LO + bin_idx * _HIST_W, 2).alias("lo_edge"),
        )
        .groupBy("bin_idx", "lo_edge")
        .agg(F.count("*").alias("n"))
    )


# --- equi-depth histogram (per-group quartiles via ntile) --------------------
# The depth-balanced counterpart of agg_histogram: NTILE(4) within each
# o_orderpriority partition (parallel window — per-group keys, never a
# global single-partition sort), rolled up to (group, quartile) min/max/
# count. The deterministic ordering tie-break (price, then key) makes
# boundary assignment — and therefore the oracle hash — exact.


@register(
    "agg_equidepth_histogram",
    oracle="""
SELECT o_orderpriority, quartile,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT o_orderpriority, o_totalprice,
           CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS INT)
               AS quartile
    FROM orders
)
GROUP BY o_orderpriority, quartile
""",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.count("*").alias("n"),
        )
    )


# --- time-interval RANGE frame (trailing-1-hour running aggregate) -----------
# The time-based sibling of win_range_frame's value-distance frame:
# per-user count/sum of events in the trailing hour, expressed as a
# RANGE frame over epoch-micros (Spark's rangeBetween is numeric, so
# the ordering column is unix_micros — identical arithmetic in the
# DuckDB oracle). One (user_id) shuffle; frame state is a sliding
# pointer pair per partition, O(1) memory per row at any history size.


@register(
    "win_time_range_frame",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT)    AS n_last_hour,
       ROUND(SUM(value) OVER w, 6)        AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 6).alias("sum_last_hour"),
    )


# --- discrete percentile (ordered-set aggregate) ------------------------------
# percentile_disc returns an ACTUAL data value (the first value whose
# cumulative rank reaches p) — the form a latency-SLO query needs,
# where interpolated percentiles (agg_percentile) would invent numbers.


@register(
    "agg_percentile_disc",
    oracle="""
SELECT l_returnflag,
       PERCENTILE_DISC(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
       PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY l_quantity) AS p95_qty,
       PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").alias(
            "p50_qty"
        ),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity)").alias(
            "p95_qty"
        ),
        F.expr(
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p99_price"),
    )


@register(
    "json_variant",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE CAST(props->>'k' AS INTEGER) >= 50
GROUP BY event_type
""",
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: parse_json once
    into the engine-native binary VARIANT encoding, then typed
    variant_get extraction — the shredded/indexed successor to
    per-access get_json_object string re-parsing (json_extract is the
    legacy twin). At 100 TB the difference is parsing each props blob
    ONCE versus once per accessed field, and VARIANT columns persist
    to parquet for scan-time pushdown."""
    e = t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


@register(
    "join_lateral_topn",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
WHERE c.c_custkey <= 50
""",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) — the
    SQL form of top-k-per-group. Catalyst decorrelates this into the
    same window/limit shapes win_topk_per_group builds by hand, which
    is the point: the declarative form survives optimization instead
    of forcing a per-row re-execution (what LATERAL naively means)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_v c,
        LATERAL (
            SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
            FROM orders_v o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_custkey <= 50
        """
    )


@register(
    "agg_unpivot",
    oracle="""
SELECT l_returnflag, metric, ROUND(val, 2) AS val
FROM (
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(SUM(l_discount), 2) AS sum_disc
    FROM lineitem GROUP BY l_returnflag
)
UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — wide-to-long reshape of an aggregate grid (the
    inverse of agg_pivot). Map-only after the aggregation: each wide
    row emits one row per named column, no shuffle and no UDF; at any
    scale the reshape rides the aggregate's existing exchange."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="val",
    ).select("l_returnflag", "metric", F.round("val", 2).alias("val"))


@register("agg_hll_intersect")  # rows-only: engine-native sketch values
def agg_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-overlap estimation via inclusion-exclusion over HLL sketches:
    |A∩B| ≈ est(A) + est(B) − est(A∪B), where A/B are the orderkey sets
    of two lineitem slices. The composition a cross-corpus overlap
    audit runs at 100 TB: each corpus keeps a KB-sized sketch (built
    incrementally, merged across shards), and ANY pairwise overlap
    estimate is sketch arithmetic — no re-scan, no join of the corpora.
    Exact distinct counts ride along as the pytest accuracy gate
    (inclusion-exclusion inherits ~3× the union's relative error, so
    the gate is loose but real — see test_extras_sketches).
    """
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "N").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.count_distinct("l_orderkey").alias("exact"),
    ).select(F.lit("A").alias("side"), "sk", "exact")
    b = li.filter(F.col("l_linestatus") == "F").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.count_distinct("l_orderkey").alias("exact"),
    ).select(F.lit("B").alias("side"), "sk", "exact")
    both = a.unionByName(b)
    rolled = both.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
        F.sum("exact").alias("sum_exact"),
    )
    wide = (
        both.groupBy()
        .pivot("side", ["A", "B"])
        .agg(
            F.first(F.hll_sketch_estimate("sk")).alias("est"),
            F.first("exact").alias("exact"),
        )
        .crossJoin(F.broadcast(rolled))
    )
    return wide.select(
        F.col("A_est").alias("est_a"),
        F.col("B_est").alias("est_b"),
        "est_union",
        (F.col("A_est") + F.col("B_est") - F.col("est_union")).alias(
            "est_intersect"
        ),
        F.col("A_exact").alias("exact_a"),
        F.col("B_exact").alias("exact_b"),
    )


# --- approximate query processing: sample-based estimation with error bars ----
# At 100 TB an exploratory "how big is this slice?" should not scan the
# corpus. The deterministic hash sample (sample_hash's P9 primitive, a
# pushed-down predicate — no shuffle, no RNG) feeds Horvitz-Thompson
# estimators: under Bernoulli(q) row inclusion, total^ = Σy/q with
# Var^ = Σy²(1−q)/q² — every quantity is pure arithmetic over the
# sample, so unlike engine-native approx aggregates this AQP path is
# ORACLE-EXACT (and the error bars are part of the answer, not a
# footnote). tests/test_aqp.py pins the exact totals inside ±3σ.

_AQP_Q = 0.1  # inclusion probability of the hash sample


@register(
    "agg_sample_estimate",
    oracle=f"""
WITH s AS (
    SELECT o_orderpriority, o_totalprice
    FROM orders
    WHERE {knuth_permille_sql("o_orderkey")} < {int(_AQP_Q * 1000)}
)
SELECT o_orderpriority,
       CAST(ROUND(COUNT(*) / {_AQP_Q}) AS BIGINT)        AS est_rows,
       ROUND(SUM(o_totalprice) / {_AQP_Q}, 2)            AS est_total,
       ROUND(SUM(o_totalprice) / {_AQP_Q}
             - 1.96 * SQRT(SUM(o_totalprice * o_totalprice)
                           * (1 - {_AQP_Q}) / ({_AQP_Q} * {_AQP_Q})), 2) AS ci_lo,
       ROUND(SUM(o_totalprice) / {_AQP_Q}
             + 1.96 * SQRT(SUM(o_totalprice * o_totalprice)
                           * (1 - {_AQP_Q}) / ({_AQP_Q} * {_AQP_Q})), 2) AS ci_hi
FROM s
GROUP BY o_orderpriority
""",
)
def agg_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    q = _AQP_Q
    s = o.filter(
        F.expr(knuth_permille_sql("o_orderkey")) < int(q * 1000)
    )
    total = F.sum("o_totalprice") / q
    var = F.sum(F.col("o_totalprice") * F.col("o_totalprice")) * (1 - q) / (q * q)
    se = F.sqrt(var)
    return s.groupBy("o_orderpriority").agg(
        F.round(F.count("*") / q).cast("long").alias("est_rows"),
        F.round(total, 2).alias("est_total"),
        F.round(total - 1.96 * se, 2).alias("ci_lo"),
        F.round(total + 1.96 * se, 2).alias("ci_hi"),
    )
