"""Skew mitigation (SURVEY.md §4 / BASELINE mandate: "skewed keys →
salting or AQE skew-join").

Chess corpora are the canonical skew case: the start position appears
in EVERY game, early opening positions in most — a handful of pos_keys
carry orders of magnitude more entries than the tail. Two defenses:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
   on in session.py) — handles join-side skew at runtime.
2. Salted two-phase aggregation (here) — handles aggregation-side
   skew: partial-aggregate on (key, salt) so one reducer never owns a
   whole hot key, then final-aggregate on key. Equivalent results by
   construction; the test proves it.

`salted_agg` is semantics-preserving for any decomposable aggregate
(sum/count/min/max — exactly the entry-combine set).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t

_DECOMPOSE = {
    # final-phase function for each partial-phase aggregate
    "sum": F.sum,
    "count": F.sum,  # counts re-combine by summing
    "min": F.min,
    "max": F.max,
}

def _decompose(how: str):
    if how not in _DECOMPOSE:
        raise ValueError(
            f"unsupported salted aggregate {how!r} (decomposable: "
            f"{sorted(_DECOMPOSE)}; avg must be expressed as sum/count)"
        )
    return _DECOMPOSE[how]



def salted_agg(
    df: DataFrame,
    key: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    agg_spec: output_col -> (how, input_col), how in sum|count|min|max.
    Phase 1 groups by (key…, salt) — the hot key's rows spread over
    `salt_buckets` reducers; phase 2 re-combines per key.
    """
    # Row-level salt, DETERMINISTIC in row content: a positional salt
    # (monotonically_increasing_id) changes under partial stage
    # re-execution — a lost map task recomputed after some reducers
    # already fetched its output can re-enumerate rows in a different
    # order, landing a row in a different (key, salt) reduce partition
    # than its already-fetched copy (double-counted or lost; the
    # SPARK-23207 class). Hashing the full row ties the salt to the
    # data itself, so every recompute routes identically. Identical
    # rows share a bucket, which is fine: map-side partial aggregation
    # combines them before the shuffle, so they contribute one group
    # entry, not reduce-side volume.
    if "_salt" in df.columns:
        raise ValueError(
            "salted_agg: input already has a '_salt' column — rename it"
        )
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
    phase1_aggs = []
    for out, (how, col) in agg_spec.items():
        fn = F.count if how == "count" else _decompose(how)
        phase1_aggs.append(fn(col).alias(out))
    phase1 = df.withColumn("_salt", salt).groupBy(*key, "_salt").agg(*phase1_aggs)
    phase2_aggs = [
        _decompose(how)(out).alias(out) for out, (how, _) in agg_spec.items()
    ]
    return phase1.groupBy(*key).agg(*phase2_aggs)


@register(
    "agg_salted_skew",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase aggregation as a driver query: 3 grouping
    values over the whole fact table is the worst aggregation-skew
    case (each reducer owns a third of 100 TB under naive groupBy).
    salted_agg spreads phase 1 over (key, salt) reducers; results are
    equal to the plain GROUP BY by construction — which is exactly
    what the oracle checks.
    """
    li = t(spark, sf_dir, "lineitem").withColumn(
        "l_qty_int", F.col("l_quantity").cast("bigint")
    )
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", "l_qty_int"),
            "cnt": ("count", "l_qty_int"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("bigint").alias("sum_qty"),
        F.col("cnt").cast("bigint").alias("cnt"),
        "min_price",
        "max_price",
    )
