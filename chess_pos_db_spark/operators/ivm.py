"""Incremental view maintenance (IVM): keep an aggregate view current
under inserts AND deletes without rescanning the base table — the
retract-stream technique (Flink retractions / Materialize deltas)
specialized to Spark batch/micro-batch.

The reference's merge machinery only ever ADDS (game imports append
positions); its aggregate store never needs retraction. A curation
corpus does: a doc removed upstream (DMCA, contamination) must leave
every downstream aggregate. For DECOMPOSABLE aggregates with inverses
(count, sum; avg = sum/count) a delta suffices:

    delta   = inserts contributing (+w) ∪ deletes contributing (-w)
    view'   = combine(view, groupBy(delta))   dropping zero-count groups

One shuffle over the DELTA (typically ≪ base) plus a combine keyed
like the view — base data is never touched. min/max are NOT inversely
maintainable (a deleted min needs a rescan of its group); that
restriction is the honest boundary of the technique and is enforced.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t


def agg_view(base: DataFrame, key: Sequence[str], val: str) -> DataFrame:
    """The maintained view shape: (key…, cnt, total)."""
    return base.groupBy(*key).agg(
        F.count("*").alias("cnt"), F.sum(val).alias("total")
    )


def maintain_agg_view(
    view: DataFrame,
    key: Sequence[str],
    val: str,
    inserts: DataFrame = None,
    deletes: DataFrame = None,
) -> DataFrame:
    """Apply insert/delete deltas to a (cnt, total) view; returns the
    updated view — equal to recomputing over the updated base (the
    property tests/test_ivm.py pins)."""
    parts = [view.select(*key, "cnt", "total")]
    if inserts is not None:
        parts.append(
            inserts.groupBy(*key).agg(
                F.count("*").alias("cnt"), F.sum(val).alias("total")
            )
        )
    if deletes is not None:
        parts.append(
            deletes.groupBy(*key).agg(
                (-F.count("*")).alias("cnt"), (-F.sum(val)).alias("total")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # cnt < 0 = over-retraction (deletes for rows not in the base, or a
    # delta applied twice around the epoch guard) — CORRUPTION, not a
    # clean retraction; it must fail loudly, never vanish through the
    # cnt > 0 filter exactly like a legitimate cnt = 0. Woven into the
    # kept cnt column so Catalyst cannot prune the guard.
    cnt_sum = F.sum("cnt")
    guarded_cnt = F.when(
        cnt_sum < 0,
        F.raise_error(
            F.lit(
                "maintain_agg_view: count went negative — delete delta "
                "contains rows absent from the base (or was applied "
                "twice); view would silently diverge from recompute"
            )
        ).cast("long"),
    ).otherwise(cnt_sum)
    return (
        out.groupBy(*key)
        .agg(guarded_cnt.alias("cnt"), F.sum("total").alias("total"))
        .filter(F.col("cnt") > 0)  # fully-retracted groups disappear
    )


@register(
    "agg_view_ivm",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(l_quantity), 2) AS total
FROM lineitem
WHERE l_orderkey % 5 <> 1 OR l_orderkey % 3 = 0
GROUP BY l_returnflag
""",
)
def agg_view_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic IVM scenario: the view is built over an initial
    base (orderkey % 3 <> 0), then maintained under an insert batch
    (the % 3 = 0 rows) and a delete batch (% 5 = 1 rows not in the
    insert set). The oracle aggregates the FINAL base directly —
    equality is exactly the IVM correctness claim.
    """
    li = t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    base = li.filter(k % 3 != 0)
    inserts = li.filter(k % 3 == 0)
    deletes = base.filter(k % 5 == 1)
    view = agg_view(base, ["l_returnflag"], "l_quantity")
    updated = maintain_agg_view(
        view, ["l_returnflag"], "l_quantity", inserts=inserts, deletes=deletes
    )
    return updated.select(
        "l_returnflag", "cnt", F.round("total", 2).alias("total")
    )
