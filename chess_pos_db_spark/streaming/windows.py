"""Time-window aggregations over the events stream (SURVEY.md §2.9).

The reference is batch + `append` (≈ micro-batching); true streaming is
a north-star addition. These are the BATCH formulations of the
streaming windows — identical `window()`/`session_window` expressions
run under `readStream` in streaming/jobs.py, and the pytest suite
asserts batch-vs-stream equivalence with Trigger.AvailableNow.

Oracle notes: Spark tumbling/sliding windows align to the Unix epoch;
DuckDB TIME_BUCKET aligns to 2000-01-03 for day-multiples but
2000-01-01 00:00 is itself epoch-aligned for sub-day buckets, so
15-minute/1-hour buckets agree between the engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t


# Shared transformations: each takes an events DataFrame (batch OR
# streaming — the expressions are identical, which is the point of the
# batch-stream equivalence tests in tests/test_streaming.py).


def tumbling_counts(e: DataFrame) -> DataFrame:
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(e: DataFrame) -> DataFrame:
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_stats(e: DataFrame) -> DataFrame:
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# T2 — tumbling window aggregation.
@register(
    "stream_tumbling",
    oracle="""
SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2)     AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(t(spark, sf_dir, "events"))


# T3 — sliding window aggregation (1 h window, 15 min slide → every event
# belongs to exactly 4 windows; the oracle replicates each event to its
# 4 window starts).
@register(
    "stream_sliding",
    oracle="""
SELECT window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2)     AS sum_value
FROM (
    SELECT TIME_BUCKET(INTERVAL '15 minutes', e.ts)
             - k.k * INTERVAL '15 minutes' AS window_start,
           e.value
    FROM events e
    CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
)
GROUP BY window_start
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(t(spark, sf_dir, "events"))


# T4 — session window (30 min gap) per user. Spark's session_window end =
# last event + gap; the oracle reproduces it with gaps-and-islands.
@register(
    "stream_session",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     <= INTERVAL '30 minutes'
                THEN 0 ELSE 1 END AS new_session
    FROM events
),
numbered AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts)                           AS session_start,
       MAX(ts) + INTERVAL '30 minutes'   AS session_end,
       CAST(COUNT(*) AS BIGINT)          AS n_events,
       ROUND(SUM(value), 2)              AS sum_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(t(spark, sf_dir, "events"))
