"""Sample-based AQP estimator (agg_sample_estimate): the Horvitz-
Thompson estimate must bracket the exact answer within its own error
bars (checked at ±3σ so the fixture assertion is deterministic-grade,
P(miss) ≈ 0.3% per group under the estimator's own model)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chess_pos_db_spark.registry import QUERIES, load_all
from chess_pos_db_spark.tables import t


def test_estimate_brackets_exact(spark, sf_dir):
    load_all()
    est = {
        r["o_orderpriority"]: r
        for r in QUERIES["agg_sample_estimate"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["total"]
        for r in t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("total"))
        .collect()
    }
    assert set(est) == set(exact)
    for prio, r in est.items():
        se = (r["ci_hi"] - r["ci_lo"]) / (2 * 1.96)
        assert abs(r["est_total"] - exact[prio]) <= 3 * se, prio
