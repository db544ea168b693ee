"""Join operators (SURVEY.md §2.3, J1–J10).

The reference's core read op is a batch point-lookup: a small probe set
(positions + children) binary-searched against every sorted run
(`executeQuery` + sparse index). In Spark that is a broadcast hash
join of the probe set against the fact table — the probe side is tiny,
so no shuffle of the fact table happens and parquet min/max pruning
plays the role of the sparse index.

Scale notes:
- dimension joins broadcast explicitly (`F.broadcast`) — at 100 TB the
  fact table must never shuffle for a 25-row nation table;
- the big-big join (orders⋈lineitem) is left to sort-merge; with both
  sides bucketed by the join key (plans/layout.py) it becomes
  shuffle-free;
- the as-of join composes range-join + per-probe top-1 window, the
  standard Spark formulation when no native as-of exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle_cc import hybrid_cc_ctes
from ..registry import register
from ..tables import t

# Probe keys used by the point-lookup queries; exist at every sf
# (o_orderkey starts at 1) and include misses for the outer variant.
_PROBE_KEYS = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987]
_PROBE_KEYS_WITH_MISSES = _PROBE_KEYS + [-1, -2, 10**12]


def _probe_df(spark: SparkSession, keys) -> DataFrame:
    schema = T.StructType([T.StructField("probe_key", T.LongType(), False)])
    return spark.createDataFrame([(int(k),) for k in keys], schema)


def _sql_values(keys) -> str:
    return ", ".join(f"({k})" for k in keys)


# J1 — batch point-lookup probe join (the reference's core read path).
@register(
    "join_broadcast_lookup",
    oracle=f"""
SELECT p.probe_key,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
       ROUND(SUM(l.l_extendedprice), 2)    AS sum_price
FROM (VALUES {_sql_values(_PROBE_KEYS)}) AS p(probe_key)
JOIN lineitem l ON l.l_orderkey = p.probe_key
GROUP BY p.probe_key
""",
)
def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The probe-key IN-list is pushed into the parquet scan (PushedFilters:
    # In(l_orderkey, ...)), so row-group min/max stats skip non-matching
    # blocks — the Spark analogue of the reference's sparse-index seek
    # (executeQuery binary-search window). Semantically redundant with the
    # inner join but load-bearing at scale: without it the scan reads the
    # full fact table.
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isin([int(k) for k in _PROBE_KEYS])
    )
    probes = _probe_df(spark, _PROBE_KEYS)
    return (
        li.join(F.broadcast(probes), li.l_orderkey == probes.probe_key)
        .groupBy("probe_key")
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# J2 — big-big equi-join (sorted/merge range scan in the reference; with
# bucketed layout this is a shuffle-free sort-merge join).
@register(
    "join_sortmerge",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT)                          AS n_lines,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


# J3 — dimension chain (entries → game header → player dims in the
# reference: first/last game id resolved via StorageHeader lookup).
@register(
    "join_dim_chain",
    oracle="""
SELECT r.r_name, n.n_name,
       CAST(COUNT(*) AS BIGINT)        AS n_lines,
       ROUND(SUM(l.l_extendedprice), 2) AS sum_price
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def join_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer SCALES with SF — no forced broadcast (SCALE.md's
        # policy: force only true KB-sized-at-any-SF dims); AQE picks
        # a dynamic broadcast at fixture scale and degrades to a
        # shuffle join when customer outgrows the threshold, instead
        # of pinning a driver-OOM broadcast at 100 TB
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# J4 — explode + join (child-move expansion: movegen produces child arrays,
# each child key probed; here: tokenize → explode → probe a broadcast dim).
@register(
    "explode_join",
    oracle="""
SELECT token,
       CAST(COUNT(*) AS BIGINT)                 AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT)   AS n_docs
FROM (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
)
WHERE token IN ('spark', 'table', 'query', 'join')
GROUP BY token
""",
)
def explode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    dim = spark.createDataFrame(
        [("spark",), ("table",), ("query",), ("join",)],
        T.StructType([T.StructField("token", T.StringType(), False)]),
    )
    return (
        tokens.join(F.broadcast(dim), "token")
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# J5 — self-join (retractions: resolve the predecessor entry of each
# position; here: next line number within the same order).
@register(
    "self_join",
    oracle="""
SELECT a.l_orderkey, a.l_linenumber,
       a.l_quantity AS qty, b.l_quantity AS next_qty
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
""",
)
def self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.col("a.l_quantity").alias("qty"),
        F.col("b.l_quantity").alias("next_qty"),
    )


# J6 — semi-join ("is this position present at all?").
@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# J7 — anti-join (positions never reached / customers without matching
# orders).
@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# J8 — left-outer probe (children with zero games are still listed in the
# explorer response; missing probes surface as NULL counts).
@register(
    "join_left_outer",
    oracle=f"""
SELECT p.probe_key, CAST(agg.n_lines AS BIGINT) AS n_lines
FROM (VALUES {_sql_values(_PROBE_KEYS_WITH_MISSES)}) AS p(probe_key)
LEFT JOIN (
    SELECT l_orderkey, COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_orderkey
) agg ON agg.l_orderkey = p.probe_key
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    probes = _probe_df(spark, _PROBE_KEYS_WITH_MISSES)
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    return probes.join(agg, probes.probe_key == agg.l_orderkey, "left_outer").select(
        "probe_key", "n_lines"
    )


# J9 — theta / range join (events bucketed into ad-hoc time ranges; the
# small range dim is broadcast so the non-equi condition is a broadcast
# nested-loop, not a cartesian shuffle).
_RANGES = [
    ("w1", "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
    ("w2", "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
    ("w3", "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
    ("w4", "2024-01-22 00:00:00", "2024-02-01 00:00:00"),
]


@register(
    "join_range_theta",
    oracle="""
SELECT r.wname,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 2)   AS sum_value
FROM (VALUES
    ('w1', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-08 00:00:00'),
    ('w2', TIMESTAMP '2024-01-08 00:00:00', TIMESTAMP '2024-01-15 00:00:00'),
    ('w3', TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-22 00:00:00'),
    ('w4', TIMESTAMP '2024-01-22 00:00:00', TIMESTAMP '2024-02-01 00:00:00')
) AS r(wname, wstart, wend)
JOIN events e ON e.ts >= r.wstart AND e.ts < r.wend
GROUP BY r.wname
""",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("wname", T.StringType(), False),
            T.StructField("wstart", T.StringType(), False),
            T.StructField("wend", T.StringType(), False),
        ]
    )
    ranges = spark.createDataFrame(_RANGES, schema).select(
        "wname",
        F.col("wstart").cast("timestamp").alias("wstart"),
        F.col("wend").cast("timestamp").alias("wend"),
    )
    return (
        e.join(
            F.broadcast(ranges),
            (e.ts >= ranges.wstart) & (e.ts < ranges.wend),
        )
        .groupBy("wname")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# J10 — as-of join: for every purchase event, the latest click by the same
# user at or before the purchase. Formulated as range join + top-1 window
# (deterministic tie-breaks on ts then event_id).
def _asof_best_click(
    e: DataFrame, join_pred, order_cols
) -> DataFrame:
    """Shared purchase/click as-of scaffolding: project the two event
    roles, LEFT-join clicks under `join_pred(p, c)`, keep the best
    click per purchase by `order_cols(joined)` (rn = 1). One place owns
    the projections and the rn==1 window, so the plain as-of and the
    nearest-in-band variant cannot drift apart on an alias or
    tie-break that must stay oracle-synced."""
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    joined = p.join(c, join_pred(p, c), "left_outer")
    w = Window.partitionBy("purchase_id").orderBy(*order_cols())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "purchase_ts", "click_ts", "click_id")
    )



@register(
    "join_asof",
    oracle="""
SELECT purchase_id, user_id, purchase_ts, click_ts, click_id
FROM (
    SELECT p.event_id   AS purchase_id,
           p.user_id    AS user_id,
           p.ts         AS purchase_ts,
           c.ts         AS click_ts,
           c.event_id   AS click_id,
           ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
           ) AS rn
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id AND c.ts <= p.ts
)
WHERE rn = 1
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return _asof_best_click(
        e,
        lambda p, c: (p.user_id == c.c_user_id)
        & (c.click_ts <= p.purchase_ts),
        lambda: (
            F.col("click_ts").desc_nulls_last(),
            F.col("click_id").desc_nulls_last(),
        ),
    )


# J8b — full outer join: both unmatched sides preserved (the explorer's
# "all legal moves, found or not" completed to both directions).
@register(
    "join_full_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, s.n_big, s.max_price
FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
FULL OUTER JOIN (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big, MAX(o_totalprice) AS max_price
    FROM orders WHERE o_totalprice > 150000
    GROUP BY o_custkey
) s ON s.o_custkey = c.c_custkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    s = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"), F.max("o_totalprice").alias("max_price"))
    )
    return c.join(s, s.o_custkey == c.c_custkey, "full_outer").select(
        "c_custkey", "c_name", "n_big", "max_price"
    )


# J12 — fuzzy entity-resolution join: blocked candidate generation +
# edit-distance verification. The standard record-linkage shape (and
# the training-data pipeline's fuzzy metadata-matching step): a cheap
# blocking key bounds the candidate set so the quadratic verify runs
# per block, never corpus x corpus. Blocking here = the name's first
# token; verification = levenshtein <= 2 (JVM built-in both engines).
# Scale: one shuffle of (block_key) on each side, per-block pair
# expansion bounded by the largest block — at 100 TB pick a key with
# bounded selectivity (here: adjective vocabulary) or df-cap blocks
# exactly as dedup_jaccard caps token postings.
@register(
    "join_fuzzy_levenshtein",
    oracle="""
WITH p AS (
    SELECT p_partkey, p_name, STRING_SPLIT(p_name, ' ')[1] AS blk
    FROM part
)
SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
""",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split("p_name", " ").getItem(0).alias("blk"),
    )
    # The per-block pair expansion multiplies the probe side by the
    # block size, so its parallelism is the PROBE SCAN's parallelism —
    # a dimension table small enough to arrive as one split runs the
    # whole quadratic verify in ONE task (measured: 29 s single-task vs
    # 2.0 s spread at sf0.1). spread_small_scan is scale-adaptive: no
    # exchange once the scan yields enough splits.
    from ..tables import spread_small_scan

    p = spread_small_scan(spark, p, "p_partkey")
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        "blk",
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        "blk",
    )
    return (
        a.join(b, "blk")
        .filter(F.col("partkey_a") < F.col("partkey_b"))
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("edit_dist") <= 2)
        .select("partkey_a", "partkey_b", "name_a", "name_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# J13 — bloom-prefiltered semi-join: the runtime-filter pattern. A
# compact bloom filter built from the (bounded, already-filtered) build
# side is applied to the probe scan BEFORE the join, so at 100 TB the
# fact scan discards ~99% of non-matching rows pre-shuffle instead of
# shipping them to the join. The bloom test is pure JVM expression
# arithmetic (xxhash64 -> packed-long bit probe — no UDF in the scan),
# the bit array is built by a tiny Spark job over the build keys (same
# xxhash64 on both sides by construction), and the EXACT semi-join still
# runs after the prefilter, so bloom false positives cannot change the
# result — the oracle is the plain IN-subquery. This is the explicit,
# deterministic form of Spark's own
# spark.sql.optimizer.runtime.bloomFilter.enabled rewrite.
# ---------------------------------------------------------------------------

_BLOOM_K = 3  # hash probes per key
_BLOOM_BUILD_MIN_PRICE = 480000


def _bloom_bits_for(n_keys: int) -> int:
    """Bit-array size for ~10 bits/key (power of two, floor 8 Kib).

    A FIXED size silently stops filtering as the build side grows: at
    sf0.1 a hard-coded 8192 bits was measured 89% saturated (~70%
    false-positive rate) — every probe row paid 3 hash tests for
    almost no pruning. Sizing from the build-side count keeps the
    ~1% FP design point at any SF. Capped at 2^17 bits (2048 packed
    longs): the words inline as array literals into the probe
    predicate, and beyond that budget a real deployment switches to
    Spark's native runtime bloom (BloomFilterAggregate + broadcast)
    rather than a megabyte-scale SQL literal."""
    import math

    target = max(8192, 10 * max(1, n_keys))
    return min(1 << math.ceil(math.log2(target)), 1 << 17)


def bloom_build_words(keys_df: DataFrame, key_col: str, m_bits: int) -> list:
    """Packed-long bloom bit array from the build-side keys — positions
    come from the same Spark xxhash64 the probe test uses.

    The packing happens EXECUTOR-side: bit positions map to
    (word_idx, single-bit long) and bit_or-aggregate per word, so the
    driver receives at most m_bits/64 rows regardless of how many build
    keys there are — the same posture as Spark's own runtime bloom
    (which builds in a BloomFilterAggregate), kept explicit here.
    """
    pos = keys_df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
                    for i in range(_BLOOM_K)
                ]
            )
        ).alias("p")
    )
    word_rows = (
        pos.select(
            F.expr("cast(p div 64 AS int)").alias("w"),
            # python F.shiftleft only takes a literal shift; the SQL
            # form shifts by a column
            F.expr("shiftleft(1L, cast(p % 64 AS int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in word_rows:
        words[r["w"]] = r["word"]  # already signed 64-bit from the JVM
    return words


def bloom_might_contain(col_name: str, words: list, m_bits: int) -> str:
    """SQL predicate: all _BLOOM_K probed bits set for this key."""
    warr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    conds = []
    for i in range(_BLOOM_K):
        p = f"pmod(xxhash64({col_name}, {i}), {m_bits})"
        w = f"element_at({warr}, cast({p} div 64 AS int) + 1)"
        conds.append(f"((shiftright({w}, cast({p} % 64 AS int)) & 1) = 1)")
    return " AND ".join(conds)


@register(
    "join_bloom_semi",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_orderkey IN (
    SELECT o_orderkey FROM orders WHERE o_totalprice > {_BLOOM_BUILD_MIN_PRICE}
)
""",
)
def join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    hi = t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _BLOOM_BUILD_MIN_PRICE
    )
    m_bits = _bloom_bits_for(hi.count())
    words = bloom_build_words(hi, "o_orderkey", m_bits)
    prefiltered = li.filter(
        F.expr(bloom_might_contain("l_orderkey", words, m_bits))
    )
    return prefiltered.join(
        F.broadcast(hi),
        prefiltered.l_orderkey == hi.o_orderkey,
        "left_semi",
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# J10b — NEAREST-in-time as-of join: each purchase pairs with the click
# minimizing |click_ts − purchase_ts| within a ±1-day band (backward
# OR forward, unlike join_asof's latest-≤ contract). The band is the
# scale contract: it turns the per-user inequality join into a bounded
# range join (candidates per probe ≈ click rate × 2 days), the same
# posture as join_range_theta; ties break on smaller delta, then lower
# click_id, so the result is deterministic and oracle-exact.

_NEAREST_BAND = "INTERVAL 1 DAY"


@register(
    "join_asof_nearest",
    oracle=f"""
SELECT purchase_id, user_id, purchase_ts, click_ts, click_id
FROM (
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           p.ts       AS purchase_ts,
           c.ts       AS click_ts,
           c.event_id AS click_id,
           ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY ABS(EPOCH_US(c.ts) - EPOCH_US(p.ts)) ASC NULLS LAST,
                        c.event_id ASC NULLS LAST
           ) AS rn
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - {_NEAREST_BAND}
     AND c.ts <= p.ts + {_NEAREST_BAND}
)
WHERE rn = 1
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    delta = F.abs(F.unix_micros("click_ts") - F.unix_micros("purchase_ts"))
    return _asof_best_click(
        e,
        lambda p, c: (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr(_NEAREST_BAND))
        & (c.click_ts <= p.purchase_ts + F.expr(_NEAREST_BAND)),
        lambda: (delta.asc_nulls_last(), F.col("click_id").asc_nulls_last()),
    )


# J14 — physical-strategy control: SHUFFLE_HASH hint. For a mid-size
# build side (too big to broadcast, small enough to hash per task)
# hash join skips BOTH sort passes a sort-merge join pays; the hint is
# the per-query escape hatch when the planner's default (SMJ) is wrong
# for a known workload. Plan-pinned: ShuffledHashJoin, not
# SortMergeJoin. Semantics are identical to the unhinted join, so the
# oracle is the plain join — what's under test is that the hint
# actually changes the physical strategy without changing results.


@register(
    "join_shuffle_hash_hint",
    oracle="""
SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l.l_extendedprice), 2) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY o.o_orderkey
""",
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J12e — END-TO-END entity resolution: blocking → pairwise verify →
# transitive closure → canonical record. The composition customers of
# the pieces actually run: join_fuzzy_levenshtein is the edge rule,
# llm/dedup.component_labels the clustering, and the survivor pick is
# one deterministic min-per-cluster reduction. Matching is transitive
# by construction here (A~B, B~C ⇒ same entity even when A,C are >2
# edits apart) — exactly what the closure models, and what pairwise
# output alone gets wrong.
#
# Scale: blocking bounds the pair join (same argument as J12); the
# closure runs on the ENTITY graph (pairs, not records); the canonical
# pick is one (cluster) aggregate. Each stage's 100 TB posture is
# inherited from the operator it reuses.
# ---------------------------------------------------------------------------


@register(
    "er_resolve",
    # closure = oracle_cc.hybrid_cc_ctes (two contraction rounds +
    # pruned recursion): the naive label walk over the fuzzy-match
    # graph (3.1M pairs at sf0.1 — dense entity near-cliques) ran past
    # the sf0.1 sweep's oracle watchdog; the hybrid is exact for any
    # graph and finishes in seconds. See the builder's docstring.
    oracle=f"""
WITH RECURSIVE p AS (
    SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk FROM part
),
pairs AS MATERIALIZED (
    SELECT a.p_partkey AS ka, b.p_partkey AS kb
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
),
{hybrid_cc_ctes("pairs", "ka", "kb", "p", "p_partkey")},
ent AS (
    SELECT node AS p_partkey, root AS entity_id FROM cc
)
SELECT c.p_partkey, c.entity_id, canon.p_name AS canonical_name,
       CAST(sz.n AS BIGINT) AS entity_size
FROM ent c
JOIN p canon ON canon.p_partkey = c.entity_id
JOIN (SELECT entity_id AS eid, COUNT(*) AS n FROM ent GROUP BY entity_id) sz
  ON sz.eid = c.entity_id
""",
)
def er_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(record, entity_id, canonical_name, entity_size): every part
    resolved to its duplicate-entity cluster."""
    from ..llm.dedup import component_labels

    p = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    pairs = join_fuzzy_levenshtein(spark, sf_dir).select(
        F.col("partkey_a").alias("doc_a"), F.col("partkey_b").alias("doc_b")
    )
    nodes = p.select(F.col("p_partkey").alias("doc_id"))
    cc = component_labels(nodes, pairs).select(
        F.col("doc_id").alias("p_partkey"),
        F.col("cluster_id").alias("entity_id"),
    )
    canon = p.select(
        F.col("p_partkey").alias("entity_id"),
        F.col("p_name").alias("canonical_name"),
    )
    size = cc.groupBy("entity_id").agg(F.count("*").alias("entity_size"))
    # canon is a projection of the ENTIRE part table (every row a
    # potential entity root) — it scales with SF, so no forced
    # broadcast: AQE broadcasts it at fixture scale and falls back to
    # a shuffle join when it outgrows the threshold (the adjacent size
    # join already follows this policy)
    return (
        cc.join(canon, "entity_id")
        .join(size, "entity_id")
        .select("p_partkey", "entity_id", "canonical_name", "entity_size")
    )
