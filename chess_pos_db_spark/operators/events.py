"""Event-analytics composites over the events fixture (SURVEY.md §2.12
extension): funnel conversion, weekly cohort retention, and path
analysis — the canonical product-analytics shapes, built purely from
the window/join/agg primitives the engine already proves pointwise.

Scale notes: every query here keys its shuffles on user_id (funnel,
retention cohorts, per-user paths) — the natural partitioning of an
event stream — with map-side partial aggregation everywhere; nothing
collects, nothing joins event×event. The one-row scalar combines at
the end of the funnel are broadcast joins of single-row aggregates
(the scalar-subquery shape tpch_q11/q15 pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import t


# Φ-E1 — three-step funnel: users who signed up, then viewed AFTER
# first signing up, then purchased AFTER that first view. Classic
# min-timestamp chain: each stage is a per-user aggregate joined to the
# next stage's events with a strict inequality. Timestamps compare
# exactly (micros in both engines), so stage membership is discrete.
@register(
    "events_funnel",
    oracle="""
WITH s AS (
    SELECT user_id, MIN(ts) AS ts1 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
    SELECT e.user_id, MIN(e.ts) AS ts2
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'view' AND e.ts > s.ts1
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS ts3
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'purchase' AND e.ts > v.ts2
    GROUP BY e.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS signup_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS viewed_after,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS purchased_after
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed single-pass funnel: ONE (user_id) exchange serves the
    whole three-step chain. Running conditional mins over the user's
    time-ordered events replace the join-per-step form (which cost a
    join+agg exchange pair PER STEP — 8 exchanges at three steps):

        ts1_run = min signup ts among STRICTLY PRECEDING rows
        a view qualifies when ts > ts1_run   -> ts2_run likewise
        a purchase qualifies when ts > ts2_run

    Strictness matches the join form exactly: an equal-ts signup
    neither qualifies the view there (ts > ts1 fails) nor here (the
    running min is <= ts, and the > check fails). The per-user rollup
    after the window reuses the window's hash partitioning, so no new
    exchange; the final three counts are one scalar aggregate. State
    per row is O(1) — no per-user event collection — so a power user
    with 10^6 events costs a longer partition, not memory.
    """
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts1_run = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    step = e.withColumn("ts1_run", ts1_run)
    qual_view = (
        (F.col("event_type") == "view")
        & F.col("ts1_run").isNotNull()
        & (F.col("ts") > F.col("ts1_run"))
    )
    step = step.withColumn(
        "ts2_run",
        F.min(F.when(qual_view, F.col("ts"))).over(w),
    )
    qual_buy = (
        (F.col("event_type") == "purchase")
        & F.col("ts2_run").isNotNull()
        & (F.col("ts") > F.col("ts2_run"))
    )
    per_user = (
        step.withColumn("is_signup", (F.col("event_type") == "signup").cast("int"))
        .withColumn("is_view_after", qual_view.cast("int"))
        .withColumn("is_buy_after", qual_buy.cast("int"))
        .groupBy("user_id")
        .agg(
            F.max("is_signup").alias("signed"),
            F.max("is_view_after").alias("viewed"),
            F.max("is_buy_after").alias("bought"),
        )
    )
    return per_user.agg(
        F.sum("signed").cast("bigint").alias("signup_users"),
        F.sum("viewed").cast("bigint").alias("viewed_after"),
        F.sum("bought").cast("bigint").alias("purchased_after"),
    )


# Φ-E2 — weekly cohort retention matrix: users grouped by the ISO week
# of their first event; each cell counts cohort members active in a
# later week, keyed by integer week offset. date_trunc('week') lands on
# Monday 00:00 in both engines and offsets divide exact day counts.
@register(
    "events_retention",
    oracle="""
WITH first_seen AS (
    SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
    FROM events GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS active_week
    FROM events
)
SELECT cohort_week,
       CAST(DATE_DIFF('day', cohort_week, active_week) / 7 AS BIGINT)
           AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM first_seen JOIN active USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    # to_date: DuckDB's DATE_TRUNC('week') yields DATE while Spark's
    # yields TIMESTAMP — normalize so the hash compares equal values.
    first_seen = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("active_week")
    ).distinct()
    return (
        first_seen.join(active, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        # no trailing orderBy: the gate's value-hash is
        # order-insensitive and there is no LIMIT, so a global sort
        # here is a pure extra range-partition exchange at scale
    )


# Φ-E3 — path analysis: the 10 most common 3-step event-type sequences
# across per-user timelines. Per-user ordering needs the full tie-break
# (ts, event_id) — event ids are unique, so the LEAD chain is
# deterministic in both engines.
@register(
    "events_path_trigrams",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type,
           LEAD(event_type, 1) OVER w AS nxt,
           LEAD(event_type, 2) OVER w AS nxt2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || nxt || '>' || nxt2 AS path,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM ordered
WHERE nxt IS NOT NULL AND nxt2 IS NOT NULL
GROUP BY path
ORDER BY cnt DESC, path
LIMIT 10
""",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    return (
        ordered.filter(F.col("nxt").isNotNull() & F.col("nxt2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "nxt", "nxt2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(10)
    )


# Φ-E4 — purchase attribution: signup→purchase pairs within 7 days
# (the batch form of streaming/jobs.purchase_attribution, which runs
# the SAME expression as a watermarked stream-stream interval join —
# batch≡stream pinned in tests/test_streaming.py). Timestamps compare
# exactly; the interval bound is the state-eviction contract at scale.
@register(
    "events_purchase_attribution",
    oracle="""
SELECT s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts, p.value
FROM events s
JOIN events p
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase'
 AND p.ts >= s.ts
 AND p.ts <= s.ts + INTERVAL 7 DAY
WHERE s.event_type = 'signup'
""",
)
def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import purchase_attribution

    e = t(spark, sf_dir, "events")
    return purchase_attribution(e, e)


# ---------------------------------------------------------------------------
# Event anomaly surfacing: top-k events by per-type z-score. The
# per-type mean/stddev are windows over the event_type partition (no
# groupBy + join-back — the text_tfidf exchange-saving trick), so the
# whole query is one shuffle on event_type plus a TakeOrdered. The
# z-score is rounded at 4dp on BOTH sides before the rank and the
# ordering carries event_id, so the top-k is deterministic across
# engines; a top-k (not a threshold flag) keeps boundary comparisons
# out of the oracle contract entirely.
# ---------------------------------------------------------------------------


@register(
    "events_anomaly",
    oracle="""
WITH scored AS (
    SELECT event_id, event_type, value,
           ROUND(ABS(value - AVG(value) OVER w)
                 / STDDEV_SAMP(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
)
SELECT event_id, event_type, value, z
FROM scored
ORDER BY z DESC, event_id
LIMIT 10
""",
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    scored = e.select(
        "event_id",
        "event_type",
        "value",
        # try_divide: a zero-variance event_type yields stddev 0, and
        # under Spark 4's default ANSI mode a plain `/` would raise
        # DIVIDE_BY_ZERO for the whole query while the DuckDB oracle
        # returns NULL z for those rows (verified: 1.0/0.0 -> NULL)
        F.round(
            F.try_divide(
                F.abs(F.col("value") - F.avg("value").over(w)),
                F.stddev_samp("value").over(w),
            ),
            4,
        ).alias("z"),
    )
    return scored.orderBy(F.desc("z"), F.asc("event_id")).limit(10)


# Φ-E6 — batch gap-sessionization: the classic lag/cumsum session
# assignment (a new session starts when the user's inter-event gap
# exceeds GAP), then per-session rollup. This is the BATCH twin of the
# streaming session_window query (stream_session) — same semantics,
# expressed as two user-keyed windows + one grouped agg, so the whole
# thing shuffles once on user_id and session counts never collect.
# Gap comparison is exact integer micros on both engines.

_SESSION_GAP_US = 8 * 3600 * 1_000_000  # 8 hours


@register(
    "events_sessionize",
    oracle=f"""
WITH o AS (
    SELECT user_id, ts, event_id, epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_us
    FROM events
),
m AS (
    SELECT user_id, ts, us,
           SUM(CASE WHEN prev_us IS NULL
                      OR us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM o
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM m
GROUP BY user_id, session_seq
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        e.select(
            "user_id", "ts", "event_id", F.unix_micros("ts").alias("us")
        )
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    return marked.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


# Φ-E7 — EWMA feature column: exponentially weighted moving average of
# `value` over each user's last 8 events (α = 0.5, weights renormalized
# over the available prefix at partition starts). Expressed as 8 LAG
# columns — pure window arithmetic, one (user_id) shuffle, no UDF, no
# per-row list materialization — the standard time-series feature
# generator for training-data pipelines. The bounded frame is the scale
# contract: state per row is 8 scalars regardless of history length
# (an unbounded EWMA needs a running recurrence — that form lives in
# streaming/jobs.py as stateful_running_stats).

_EWMA_ALPHA = 0.5
_EWMA_WINDOW = 8


def _ewma_terms():
    num, den = F.lit(0.0), F.lit(0.0)
    for j in range(_EWMA_WINDOW):
        w = _EWMA_ALPHA**j
        lag = F.lag("value", j).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        num = num + F.when(lag.isNotNull(), F.lit(w) * lag).otherwise(0.0)
        den = den + F.when(lag.isNotNull(), F.lit(w)).otherwise(0.0)
    return num, den


def _ewma_oracle_terms() -> tuple[str, str]:
    num = " + ".join(
        f"COALESCE({_EWMA_ALPHA**j} * LAG(value, {j}) OVER w, 0)"
        for j in range(_EWMA_WINDOW)
    )
    den = " + ".join(
        f"(CASE WHEN LAG(value, {j}) OVER w IS NULL THEN 0 ELSE {_EWMA_ALPHA**j} END)"
        for j in range(_EWMA_WINDOW)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_oracle_terms()


@register(
    "events_ewma",
    oracle=f"""
SELECT event_id, user_id, ts, value,
       ROUND(({_EWMA_NUM}) / ({_EWMA_DEN}), 6) AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    num, den = _ewma_terms()
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(num / den, 6).alias("ewma"),
    )


# Φ-E8 — calendar-hierarchy rollup: event volume at (year, month, day)
# with ROLLUP supertotals — the time-dimension form of agg_rollup.
# Partial aggregation applies per grouping set, so the exchange moves
# (calendar keys × sets) rows, not events.


@register(
    "events_time_rollup",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM ts) AS INT)  AS y,
       CAST(EXTRACT(MONTH FROM ts) AS INT) AS m,
       CAST(EXTRACT(DAY FROM ts) AS INT)   AS d,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events
GROUP BY ROLLUP (1, 2, 3)
""",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


# Φ-E9 — interval-overlap join WITHOUT an equi-key (the generic
# temporal-overlap shape: ad impressions × sessions, outages ×
# requests). Naively this is a theta join — a cartesian product at
# scale. The scale-safe plan decomposes time into fixed buckets sized
# >= the interval length, explodes each interval to the 1-2 buckets it
# covers (map-only), and equi-joins on the bucket; the exact overlap
# predicate then verifies candidates. A pair whose intervals share two
# buckets would match twice, so each pair is emitted ONLY in the bucket
# containing the overlap's start (max of the two starts) — dedup by
# construction, no distinct needed. Candidate volume per bucket is
# (clicks/bucket × purchases/bucket), bounded by bucket granularity,
# never |A|×|B|. Overlap arithmetic is exact integer micros.

_IVL_LEN_US = 30 * 60 * 1_000_000  # each event opens a 30-min interval
_IVL_BUCKET_US = 3_600 * 1_000_000  # 1-hour buckets (>= interval length)


@register(
    "join_interval_overlap",
    oracle=f"""
WITH a AS (
    SELECT event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'
),
b AS (
    SELECT event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'
)
SELECT a.event_id AS click_id,
       CAST(COUNT(*) AS BIGINT) AS n_overlaps,
       CAST(SUM({_IVL_LEN_US} - ABS(a.us - b.us)) AS BIGINT) AS total_overlap_us
FROM a JOIN b
  ON a.us <= b.us + {_IVL_LEN_US} AND b.us <= a.us + {_IVL_LEN_US}
GROUP BY a.event_id
ORDER BY n_overlaps DESC, click_id
LIMIT 50
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    L, B = _IVL_LEN_US, _IVL_BUCKET_US

    def side(ev_type: str, id_alias: str, us_alias: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == ev_type)
            .select(
                F.col("event_id").alias(id_alias),
                F.unix_micros("ts").alias(us_alias),
            )
            .withColumn(
                "bucket",
                F.explode(
                    F.sequence(
                        F.expr(f"{us_alias} div {B}"),
                        F.expr(f"({us_alias} + {L}) div {B}"),
                    )
                ),
            )
        )

    a = side("click", "click_id", "a_us")
    b = side("purchase", "b_id", "b_us")
    pairs = a.join(
        b,
        (a["bucket"] == b["bucket"])
        & (F.col("a_us") <= F.col("b_us") + L)
        & (F.col("b_us") <= F.col("a_us") + L)
        # emit each pair once: only in the overlap-start's bucket
        & (F.expr(f"greatest(a_us, b_us) div {B}") == a["bucket"]),
    )
    return (
        pairs.groupBy("click_id")
        .agg(
            F.count("*").alias("n_overlaps"),
            F.sum(F.lit(L) - F.abs(F.col("a_us") - F.col("b_us")))
            .alias("total_overlap_us"),
        )
        .orderBy(F.desc("n_overlaps"), F.asc("click_id"))
        .limit(50)
    )


@register(
    "events_resample_ffill",
    oracle="""
WITH e AS (SELECT * FROM events WHERE user_id <= 3),
b AS (
    SELECT user_id, date_trunc('hour', MIN(ts))::TIMESTAMP AS h0,
           date_trunc('hour', MAX(ts))::TIMESTAMP AS h1
    FROM e GROUP BY user_id
),
grid AS (
    SELECT user_id,
           UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
    FROM b
),
obs AS (
    SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS hour_start, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM e
),
lo AS (SELECT user_id, hour_start, value AS obs_value FROM obs WHERE rn = 1)
SELECT g.user_id, g.hour_start,
       ROUND(LAST_VALUE(l.obs_value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS filled_value,
       l.obs_value IS NOT NULL AS is_observed
FROM grid g
LEFT JOIN lo l ON g.user_id = l.user_id AND g.hour_start = l.hour_start
""",
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: each user's irregular event
    stream becomes a dense hourly grid carrying the last observed value
    (the feature-store/monitoring "as-of each hour" view).

    Scale shape: the grid GENERATES inside the row (sequence+explode —
    grid size is time-range × users, never a cross join against a
    calendar table); both windows and the grid↔observation join share
    the (user_id) key, so one exchange family serves the whole plan and
    users parallelize independently. The first grid hour is the first
    observation's hour, so the fill never reads across users.
    """
    e = t(spark, sf_dir, "events").filter(F.col("user_id") <= 3)
    b = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = b.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start"),
    )
    w_h = Window.partitionBy("user_id", "hour_start").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last_in_hour = (
        e.select(
            "user_id",
            F.date_trunc("hour", "ts").alias("hour_start"),
            "ts",
            "event_id",
            "value",
        )
        .withColumn("rn", F.row_number().over(w_h))
        .filter(F.col("rn") == 1)
        .select("user_id", "hour_start", F.col("value").alias("obs_value"))
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(last_in_hour, ["user_id", "hour_start"], "left").select(
        "user_id",
        "hour_start",
        F.round(F.last("obs_value", ignorenulls=True).over(w_f), 2).alias(
            "filled_value"
        ),
        F.col("obs_value").isNotNull().alias("is_observed"),
    )


@register(
    "scd2_build",
    oracle="""
WITH attr AS (
    SELECT user_id, ts, value, event_id
    FROM events WHERE event_type = 'signup' AND user_id <= 20
)
SELECT user_id,
       ROUND(value, 2) AS attr_value,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           AS is_current
FROM attr
""",
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: an attribute change feed
    becomes validity-interval rows (valid_from, valid_to, is_current) —
    the warehouse artifact a temporal lookup joins against.

    One (user_id) window over the change feed; at 100 TB the feed
    shuffles once on the dimension key and each key's history is
    independent. valid_to is exclusive (next change's timestamp),
    NULL = open-ended current row.
    """
    attr = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "signup") & (F.col("user_id") <= 20)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return attr.select(
        "user_id",
        F.round("value", 2).alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "join_scd2_temporal",
    oracle="""
WITH attr AS (
    SELECT user_id, ts, value, event_id
    FROM events WHERE event_type = 'signup' AND user_id <= 20
),
dim AS (
    SELECT user_id, ROUND(value, 2) AS attr_value, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
    FROM attr
),
fact AS (
    SELECT event_id, user_id, ts
    FROM events WHERE event_type = 'purchase' AND user_id <= 20
)
SELECT f.event_id, f.user_id, d.attr_value
FROM fact f
JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from <= f.ts
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
""",
)
def join_scd2_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) lookup against the SCD2 dimension:
    each purchase reads the attribute version valid AT ITS OWN event
    time — the correctness property a plain latest-value join gets
    wrong for historical facts.

    Plan: equi-join on the dimension key carries the whole shuffle;
    the interval predicate is a post-join filter on co-located rows
    (each key's versions are few), so this stays a hash/SMJ join —
    never an interval cross join. The as-of window form (join_asof)
    is the same semantics when the dim fits the window side; this is
    the form you use when the SCD2 table is the shared artifact.
    """
    # both sides derive from the same events scan — alias to keep the
    # join predicate unambiguous (self-join lineage)
    dim = (
        scd2_build(spark, sf_dir)
        .select(
            F.col("user_id").alias("d_user_id"),
            "attr_value",
            "valid_from",
            "valid_to",
        )
    )
    fact = (
        t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") <= 20))
        .select("event_id", "user_id", "ts")
    )
    cond = (
        (F.col("d_user_id") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return fact.join(dim, cond).select("event_id", "user_id", "attr_value")


@register(
    "events_basket_lift",
    oracle="""
WITH u AS (
    SELECT DISTINCT user_id, event_type FROM events
),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
supp AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY event_type
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both
    FROM u a JOIN u b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_both,
       ROUND(p.n_both * 1.0 / n.n_users, 4) AS support,
       ROUND((p.n_both * 1.0 / n.n_users)
             / ((sa.n * 1.0 / n.n_users) * (sb.n * 1.0 / n.n_users)),
             4) AS lift
FROM pairs p
JOIN supp sa ON sa.event_type = p.type_a
JOIN supp sb ON sb.event_type = p.type_b, n
""",
)
def events_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pairwise association over event types: for every
    type pair, co-occurrence support across users and lift vs
    independence — the "users who did X also did Y" report.

    Scale shape: the per-user distinct shuffle is the only data-sized
    exchange (identical subplans on the self-join sides reuse it —
    ReusedExchange); the pair self-join keys on user_id over the
    ALREADY DISTINCT (user, type) rows, so fan-out per user is bounded
    by the type-vocabulary (k² per user worst case, with k = distinct
    types — catalog-sized, not event-sized); supports broadcast back.
    The n_users scalar rides as a broadcast one-row crossJoin (the
    oracle's `, n` shape), keeping the whole query a LAZY plan — an
    earlier form ran a checkpoint + count at query-BUILD time, which
    made plan-only tooling execute real jobs.
    """
    e = t(spark, sf_dir, "events")
    u = e.select("user_id", "event_type").distinct()
    n = e.agg(F.countDistinct("user_id").alias("n_users"))
    supp = u.groupBy("event_type").agg(F.count("*").alias("n"))
    a = u.select("user_id", F.col("event_type").alias("type_a"))
    b = u.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = supp.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = supp.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    support = F.col("n_both") / F.col("n_users")
    lift = support / (
        (F.col("n_a") / F.col("n_users")) * (F.col("n_b") / F.col("n_users"))
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(support, 4).alias("support"),
            F.round(lift, 4).alias("lift"),
        )
    )
