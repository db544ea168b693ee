"""Batch-vs-stream equivalence (SURVEY.md §5.2.4): every streaming op,
driven to completion with Trigger.AvailableNow, must produce the same
result as its batch formulation on the same data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chess_pos_db_spark.streaming import jobs
from chess_pos_db_spark.streaming.windows import session_stats, tumbling_counts
from chess_pos_db_spark.tables import t


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events split into 3 parquet files so the file stream sees 3
    micro-batches (maxFilesPerTrigger=1) — simulates incremental
    arrival of game files (reference `append`)."""
    path = str(tmp_path_factory.mktemp("events_chunks"))
    t(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(path)
    return path


def _rows(df):
    return sorted([tuple(str(x) for x in r) for r in df.collect()])


def test_stream_tumbling_equals_batch(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    got = jobs.run_available_now(tumbling_counts(stream), "complete")
    want = tumbling_counts(spark.read.parquet(events_dir))
    assert _rows(got) == _rows(want)


def test_stream_session_equals_batch(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    # session_window in streaming requires a watermark; the stream is
    # finite so a long delay keeps every session in the final output.
    got = jobs.run_available_now(
        session_stats(jobs.with_watermark(stream, "100 days")), "complete"
    )
    want = session_stats(spark.read.parquet(events_dir))
    assert _rows(got) == _rows(want)


def test_stream_sliding_equals_batch(spark, events_dir):
    """sliding_counts was the one shared window transformation without
    a batch≡stream pin (tumbling and session had them) — a
    streaming-specific regression in the overlapping-window path would
    otherwise pass CI on the batch oracle alone."""
    from chess_pos_db_spark.streaming.windows import sliding_counts

    stream = jobs.read_events_stream(spark, events_dir)
    got = jobs.run_available_now(sliding_counts(stream), "complete")
    want = sliding_counts(spark.read.parquet(events_dir))
    assert _rows(got) == _rows(want)


def test_stream_dedup_equals_batch(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    got = jobs.run_available_now(
        jobs.dedup_stream(stream).select("event_id"), "append"
    )
    want = spark.read.parquet(events_dir).select("event_id").distinct()
    assert _rows(got) == _rows(want)


def test_incremental_ingest_upsert(spark, events_dir, tmp_path):
    """foreachBatch append-runs + compaction ≡ one-shot batch agg —
    the reference's append+merge cycle gives the same DB as a fresh
    create over all files."""
    compacted = jobs.incremental_ingest(
        spark,
        events_dir,
        str(tmp_path / "runs"),
        str(tmp_path / "compacted"),
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )
    got = {(r[0], r[1], r[2], round(r[3], 6), r[4], r[5]) for r in compacted.collect()}
    want = {(r[0], r[1], r[2], round(r[3], 6), r[4], r[5]) for r in batch.collect()}
    assert got == want


def test_watermark_tumbling_subset(spark, events_dir):
    """T5: with a watermark in append mode the chunks arrive time-shuffled,
    so late events may legitimately be dropped: emitted windows must be a
    subset of batch windows with counts <= batch counts, and most windows
    must still be emitted."""
    stream = jobs.read_events_stream(spark, events_dir)
    got = jobs.run_available_now(
        tumbling_counts(jobs.with_watermark(stream, "1 hour")), "append"
    )
    want = tumbling_counts(spark.read.parquet(events_dir))
    got_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    want_map = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in want.collect()
    }
    assert set(got_map) <= set(want_map)
    assert all(got_map[k] <= want_map[k] for k in got_map)
    # Append mode withholds windows not yet below the watermark at
    # stream end, and shuffled arrival drops late events — but the
    # majority of windows must still be emitted and finalized.
    assert len(got_map) >= 0.5 * len(want_map)


def test_stateful_running_stats_equals_batch(spark, events_dir):
    """applyInPandasWithState running totals: the last update emitted per
    key (largest cnt — totals only grow) must equal the one-shot batch
    aggregation."""
    stream = jobs.read_events_stream(spark, events_dir)
    got = jobs.run_available_now(jobs.stateful_running_stats(stream), "update")
    final = {}
    for r in got.collect():
        if r.event_type not in final or r.cnt > final[r.event_type][0]:
            final[r.event_type] = (r.cnt, round(r.sum_value, 6))
    want = {
        r.event_type: (r.cnt, round(r.sum_value, 6))
        for r in spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert final == want


def test_stream_stream_join_equals_batch(spark, events_dir):
    """T: stream-stream interval join (purchase attribution) must equal
    the same join over the batch frames."""
    streamed = jobs.run_available_now(
        jobs.purchase_attribution(
            jobs.read_events_stream(spark, events_dir),
            jobs.read_events_stream(spark, events_dir),
            # chunks are not time-ordered: the watermark must tolerate
            # the full fixture span for exact batch equivalence
            delay="40 days",
        ),
        output_mode="append",
    )
    batch_events = spark.read.parquet(events_dir)
    expected = jobs.purchase_attribution(batch_events, batch_events)
    assert _rows(streamed) == _rows(expected)
    assert streamed.count() > 0


def test_tws_running_stats_equals_batch(spark, events_dir):
    """transformWithStateInPandas (Spark 4 state API) running totals
    must converge to the same final per-key totals as the one-shot
    batch aggregation — and as the applyInPandasWithState form."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "TWS state protocol needs google.protobuf (broken in this "
            "container); stateful_running_stats covers the operator"
        )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = jobs.read_events_stream(spark, events_dir)
    got = jobs.run_available_now(
        jobs.stateful_running_stats_tws(stream), "update"
    )
    final = {}
    for r in got.collect():
        if r.event_type not in final or r.cnt > final[r.event_type][0]:
            final[r.event_type] = (r.cnt, round(r.sum_value, 6))
    want = {
        r.event_type: (r.cnt, round(r.sum_value, 6))
        for r in spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert final == want


def test_incremental_ingest_restart_resume_exactly_once(spark, sf_dir, tmp_path):
    """The exactly-once restart story: ingest a first wave of files,
    then add a second wave and RE-RUN with the same checkpoint. The
    checkpoint must skip everything already processed (no double
    counting) and pick up only the new files — final compacted DB
    equals a one-shot batch aggregate over all files."""
    import glob

    src = str(tmp_path / "src")
    ev = t(spark, sf_dir, "events")
    wave1 = ev.filter(F.col("event_id") % 2 == 0)
    wave2 = ev.filter(F.col("event_id") % 2 == 1)
    wave1.repartition(2).write.mode("append").parquet(src)

    runs, compacted = str(tmp_path / "runs"), str(tmp_path / "compacted")
    jobs.incremental_ingest(spark, src, runs, compacted)
    # runs land in per-epoch directories (idempotent replay layout)
    n_runs_after_wave1 = len(glob.glob(runs + "/**/*.parquet", recursive=True))

    wave2.repartition(2).write.mode("append").parquet(src)
    final = jobs.incremental_ingest(spark, src, runs, compacted)

    batch = (
        spark.read.parquet(src)
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )
    got = {(r[0], r[1], r[2], round(r[3], 6), r[4], r[5]) for r in final.collect()}
    want = {(r[0], r[1], r[2], round(r[3], 6), r[4], r[5]) for r in batch.collect()}
    assert got == want
    # the second run appended new runs (processed wave2) rather than
    # reprocessing wave1 from scratch into a fresh set
    assert (
        len(glob.glob(runs + "/**/*.parquet", recursive=True))
        > n_runs_after_wave1
    )


def test_stream_static_enrich_equals_batch(spark, sf_dir, events_dir):
    """Stream-static broadcast enrichment must equal the same join over
    the batch frame."""
    dim = t(spark, sf_dir, "customer")
    got = jobs.run_available_now(
        jobs.enrich_stream(jobs.read_events_stream(spark, events_dir), dim),
        "complete",
    )
    want = jobs.enrich_stream(spark.read.parquet(events_dir), dim)
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_streaming_cms_equals_batch_sketch(spark, events_dir, tmp_path):
    """Mergeable-sketch law, streaming form: per-micro-batch CMS cells
    appended then summed must equal the one-pass batch sketch over the
    same files."""
    from chess_pos_db_spark.llm.mining import cms_cells

    merged = jobs.streaming_cms(spark, events_dir, str(tmp_path / "cells"))
    batch = cms_cells(
        spark.read.parquet(events_dir).select(
            F.col("event_type").alias("token")
        )
    )
    got = {(r["i"], r["col"]): r["cnt"] for r in merged.collect()}
    want = {(r["i"], r["col"]): r["cnt"] for r in batch.collect()}
    assert got == want


@pytest.mark.slow
def test_stream_stream_left_outer_join_equals_batch(spark, sf_dir, tmp_path):
    """T8b: LEFT OUTER stream-stream interval join. Outer (null-padded)
    rows may only emit once the watermark PROVES no match can arrive,
    so they trickle out as event time advances: run 1 drains the
    corpus (watermark still inside every window -> inner matches only);
    a far-future sentinel event then pushes the watermark past every
    window and run 2 (same checkpoint) flushes exactly the unmatched
    signups. Union of both runs == the batch outer join."""
    from pyspark.sql import functions as F

    from chess_pos_db_spark.streaming import jobs

    src = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    t(spark, sf_dir, "events").repartition(3).write.parquet(src)

    def run_once():
        stream = jobs.read_events_stream(spark, src)
        q = (
            jobs.purchase_attribution_outer(stream, stream, delay="720 hours")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    after_run1 = spark.read.parquet(out_dir)
    assert after_run1.filter(F.col("purchase_ts").isNull()).count() == 0

    # The sentinels must SURVIVE the event_type filters on both join
    # inputs: the watermark node sits after the filter, so a filtered
    # row advances nothing (and with the default min-of-watermarks
    # policy BOTH sides must advance). Their own windows stay open
    # (ts + 7d > new watermark), so they add no output rows below
    # the user_id cutoff.
    batch = spark.read.schema(jobs.EVENTS_SCHEMA).parquet(src)
    max_ts = batch.agg(F.max("ts")).head()[0]
    sentinels = spark.createDataFrame(
        [
            (10**9, max_ts, 10**6, "signup", 0.0, "{}"),
            (10**9 + 1, max_ts, 10**6 + 1, "purchase", 0.0, "{}"),
        ],
        jobs.EVENTS_SCHEMA,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 5000 HOURS"))
    sentinels.coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = sorted(
        (r["user_id"], str(r["signup_ts"]), str(r["purchase_ts"]))
        for r in spark.read.parquet(out_dir)
        .filter(F.col("user_id") < 10**6)
        .collect()
    )
    expect = sorted(
        (r["user_id"], str(r["signup_ts"]), str(r["purchase_ts"]))
        for r in jobs.purchase_attribution_outer(batch, batch).collect()
    )
    assert got == expect
    # the outer semantics actually bite: some signups never converted
    assert any(p == "None" for _, _, p in got)


def test_incremental_ingest_wiped_checkpoint_prunes_stale_epochs(
    spark, tmp_path
):
    """Epoch-keyed overwrite only protects SAME-epoch replay; a wiped
    checkpoint renumbers from 0, and a rerun with fewer source files
    would leave the original run's high-numbered epoch dirs behind for
    compact_runs to silently double-count. The sink prunes stale
    higher epochs as it applies each batch, so the recompacted result
    equals a fresh batch aggregate over the REMAINING files."""
    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    base = t(spark, "/root/testdata/sf0.001", "events").limit(40)
    for i in range(3):
        staged = str(tmp_path / f"stage{i}")
        base.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        # the file stream scans FILES in src, not nested directories
        shutil.copy(
            glob.glob(f"{staged}/part-*.parquet")[0],
            str(src / f"f{i}.parquet"),
        )

    runs = str(tmp_path / "runs")
    comp = str(tmp_path / "comp")
    first = jobs.incremental_ingest(
        spark, str(src), runs, comp
    ).collect()
    assert first

    # drop one source file, wipe ONLY the checkpoint, re-ingest
    (src / "f2.parquet").unlink()
    shutil.rmtree(runs + "_chk")
    second = sorted(
        tuple(r)
        for r in jobs.incremental_ingest(
            spark, str(src), runs, str(tmp_path / "comp2")
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(str(src))
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .collect()
    )
    assert second == want  # no double-counted stale epoch


def test_prune_stale_epochs_rejects_remote_uri():
    """os.path.isdir is always False on a remote URI, so the
    wiped-checkpoint double-count protection would silently no-op on
    non-local runs/cells dirs — the sink maintenance path rejects
    remote URIs loudly instead (same contract as the importer's
    _require_local)."""
    import pytest

    with pytest.raises(ValueError, match="remote URI"):
        jobs._prune_stale_epochs("s3a://bucket/runs", 3)
    with pytest.raises(ValueError, match="remote URI"):
        jobs._prune_stale_epochs("hdfs://nn/runs", 0)
    # local missing dir still quietly no-ops (nothing to prune)
    jobs._prune_stale_epochs("/nonexistent/local/dir", 1)


def test_store_apply_stream_merges_into_manifest_store(spark, tmp_path):
    """The manifest store as a streaming CDC SINK: each micro-batch
    merges copy-on-write via upsert_rows (one snapshot version per
    batch — time travel sees every intermediate state), a batch mixing
    versions of one key resolves latest-per-seq, and a wiped-checkpoint
    replay CONVERGES to the same live state (new version ids, same
    logical content — the manifest is the commit record, no pointer)."""
    import os
    import shutil

    from pyspark.sql import types as T

    from chess_pos_db_spark.plans import layout
    from chess_pos_db_spark.streaming import jobs

    src = str(tmp_path / "chg")
    store = str(tmp_path / "cdc_sink_store")
    layout.append_versioned(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string"),
        store, ["k"],
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("val", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    b1 = [(2, "B0", "U", 1), (2, "B", "U", 2), (3, "c", "I", 1)]
    b2 = [(1, None, "D", 3), (4, "d", "I", 3)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    live = jobs.store_apply_stream(
        spark, src, schema, store, ["k"], seq_col="seq",
        max_files_per_trigger=1,
    )
    want = [(2, "B"), (3, "c"), (4, "d")]
    assert sorted(tuple(r) for r in live.collect()) == want
    # one version per non-empty batch, each intermediate state readable
    m = layout.read_manifest(store)
    versions = sorted(s["id"] for s in m["snapshots"])
    assert len(versions) == 3  # seed + 2 batches
    assert layout.read_snapshot(spark, store, versions[0]).count() == 2

    # wiped checkpoint: the replay converges (same live content)
    shutil.rmtree(store + "_chk")
    live2 = jobs.store_apply_stream(
        spark, src, schema, store, ["k"], seq_col="seq"
    )
    assert sorted(tuple(r) for r in live2.collect()) == want

    # without seq_col, a key-conflicting batch fails loudly
    store2 = str(tmp_path / "conflict_store")
    layout.append_versioned(
        spark.createDataFrame([(1, "a")], "k long, val string"),
        store2, ["k"],
    )
    src2 = str(tmp_path / "chg2")
    spark.createDataFrame(
        [(1, "x", "U", 1), (1, "y", "U", 2)], schema
    ).coalesce(1).write.mode("append").parquet(src2)
    with pytest.raises(Exception, match="conflicting change rows"):
        jobs.store_apply_stream(
            spark, src2,
            T.StructType([f for f in schema.fields if f.name != "seq"]),
            store2, ["k"],
        )


@pytest.mark.slow
def test_store_to_store_replication_via_export_log(spark, tmp_path):
    """Full manifest-store replication: store A evolves through every
    lifecycle verb (append, copy-on-write upsert with a genuine U,
    delete), export_changes emits its delta-sized log, and
    store_apply_stream folds that log into manifest store B — B's live
    state equals A's, and B is a REAL store (time travel to its seed,
    its own manifest versions). to_version is the seq column, so a
    micro-batch bundling several exported versions still resolves
    per key."""
    from pyspark.sql import types as T

    from chess_pos_db_spark.plans import layout
    from chess_pos_db_spark.streaming import jobs

    a = str(tmp_path / "store_a")
    b = str(tmp_path / "store_b")
    out = str(tmp_path / "a_log")
    mk = lambda rows: spark.createDataFrame(rows, "k long, val string")
    layout.append_versioned(mk([(1, "a"), (2, "b"), (3, "c")]), a, ["k"])
    layout.upsert_rows(
        spark, a,
        spark.createDataFrame(
            [(2, "B", "U"), (4, "d", "I")], "k long, val string, op string"
        ),
    )
    layout.delete_rows(spark, a, "k = 3")
    assert layout.export_changes(spark, a, out, ["k"]) == [1, 2, 3]

    layout.append_versioned(mk([]), b, ["k"])  # empty seed store
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("val", T.StringType()),
            T.StructField("to_version", T.IntegerType()),
        ]
    )
    live_b = jobs.store_apply_stream(
        spark, f"{out}/changes", schema, b, ["k"], seq_col="to_version"
    )
    want = sorted(
        tuple(r) for r in layout.read_snapshot(spark, a).collect()
    )
    assert sorted(tuple(r) for r in live_b.select("k", "val").collect()) == want
    assert want == [(1, "a"), (2, "B"), (4, "d")]
    # B is a real store: its seed version still answers empty
    assert layout.read_snapshot(spark, b, 1).count() == 0


def test_store_replication_follows_schema_evolution(spark, tmp_path):
    """Round-11 seam pinned at the streaming consumer: source store A
    evolves additively mid-history (v2's upsert carries a new `lang`
    column), its exported log replays into replica store B via
    store_apply_stream — with allow_new_columns=True B follows the
    evolution (pre-evolution rows answer NULL), and WITHOUT it the
    first evolved batch fails loudly instead of silently corrupting."""
    from pyspark.sql import types as T

    from chess_pos_db_spark.plans import layout
    from chess_pos_db_spark.streaming import jobs

    a = str(tmp_path / "evo_a")
    b = str(tmp_path / "evo_b")
    out = str(tmp_path / "evo_a_log")
    layout.append_versioned(
        spark.createDataFrame([(1, "t1"), (2, "t2")], "k long, txt string"),
        a, ["k"],
    )
    layout.upsert_rows(
        spark, a,
        spark.createDataFrame(
            [(2, "T2", "en", "U"), (3, "t3", "fr", "I")],
            "k long, txt string, lang string, op string",
        ),
        allow_new_columns=True,
    )
    layout.delete_rows(spark, a, "k = 1")
    assert layout.export_changes(spark, a, out, ["k"]) == [1, 2, 3]

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("txt", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("to_version", T.IntegerType()),
        ]
    )
    # loud default: the evolved batch fails the stream, B untouched
    layout.append_versioned(
        spark.createDataFrame([], "k long, txt string"), b, ["k"]
    )
    with pytest.raises(Exception, match="allow_new_columns"):
        jobs.store_apply_stream(
            spark, f"{out}/changes", schema, b, ["k"],
            seq_col="to_version",
        )

    b2 = str(tmp_path / "evo_b2")
    layout.append_versioned(
        spark.createDataFrame([], "k long, txt string"), b2, ["k"]
    )
    live = jobs.store_apply_stream(
        spark, f"{out}/changes", schema, b2, ["k"],
        seq_col="to_version", allow_new_columns=True,
    )
    got = sorted(
        (r["k"], r["txt"], r["lang"]) for r in live.collect()
    )
    want = sorted(
        (r["k"], r["txt"], r["lang"])
        for r in layout.read_snapshot(spark, a).collect()
    )
    assert got == want == [(2, "T2", "en"), (3, "t3", "fr")]


@pytest.mark.slow
def test_store_replication_randomized_against_source(spark, tmp_path):
    """Randomized end-to-end replication: source store A runs a seeded
    random lifecycle (appends, whole-row upserts including
    update-to-NULL, deletes, an additive evolution), exports its
    delta-sized log, and ONE store_apply_stream run folds the log into
    empty replica B (to_version as the seq column — availableNow
    bundles the whole history into one batch, so latest-state-per-key
    resolution must equal the sequential fold). B's live state must
    equal A's exactly, evolved column included. Complements the
    batch-side randomized fold in test_layout with the streaming
    consumer path."""
    import random

    from pyspark.sql import types as T

    from chess_pos_db_spark.plans import layout
    from chess_pos_db_spark.streaming import jobs

    for seed in range(2):
        rng = random.Random(1000 + seed)
        a = str(tmp_path / f"rsrc_{seed}")
        b = str(tmp_path / f"rdst_{seed}")
        out = str(tmp_path / f"rlog_{seed}")
        model: dict[int, tuple] = {}  # k -> (val, x)
        nxt = [0]

        def fresh():
            nxt[0] += 1
            return nxt[0]

        first = {k: (fresh(), None) for k in range(6)}
        model.update(first)
        layout.append_versioned(
            spark.createDataFrame(
                [(k, v) for k, (v, _) in sorted(first.items())],
                "k long, val long",
            ),
            a,
            ["k"],
        )
        evolved = False
        for _ in range(6):
            op = rng.choice(["append", "upsert", "delete", "evolve"])
            if op == "append":
                ks = [
                    k for k in rng.sample(range(10, 60), 3) if k not in model
                ]
                if not ks:
                    continue
                for k in ks:
                    model[k] = (fresh(), None)
                layout.append_versioned(
                    spark.createDataFrame(
                        [(k, model[k][0]) for k in sorted(ks)],
                        "k long, val long",
                    ),
                    a,
                    ["k"],
                )
            elif op == "upsert":
                rows = []
                for k in rng.sample(sorted(model), min(2, len(model))):
                    v = None if rng.random() < 0.3 else fresh()
                    rows.append((k, v, "U"))
                    model[k] = (v, None)  # whole-row: evolved col resets
                layout.upsert_rows(
                    spark,
                    a,
                    spark.createDataFrame(rows, "k long, val long, op string"),
                )
            elif op == "delete":
                m = rng.choice([4, 5])
                doomed = [k for k in model if k % m == 1]
                res = layout.delete_rows(spark, a, f"k % {m} = 1")
                assert (res["version"] is not None) == bool(doomed)
                for k in doomed:
                    model.pop(k)
            else:
                if not model:
                    continue
                k = rng.choice(sorted(model))
                x = fresh()
                model[k] = (model[k][0], x)
                layout.upsert_rows(
                    spark,
                    a,
                    spark.createDataFrame(
                        [(k, model[k][0], x, "U")],
                        "k long, val long, x long, op string",
                    ),
                    allow_new_columns=True,
                )
                evolved = True

        layout.export_changes(spark, a, out, ["k"])
        layout.append_versioned(
            spark.createDataFrame([], "k long, val long"), b, ["k"]
        )
        fields = [
            T.StructField("k", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
        if evolved:
            fields.append(T.StructField("x", T.LongType()))
        fields.append(T.StructField("to_version", T.IntegerType()))
        live_b = jobs.store_apply_stream(
            spark, f"{out}/changes", T.StructType(fields), b, ["k"],
            seq_col="to_version", allow_new_columns=True,
        )
        cols = ["k", "val", "x"] if evolved else ["k", "val"]
        got = sorted(
            tuple(r.asDict().get(c) for c in cols)
            for r in live_b.collect()
        )
        want_live = sorted(
            tuple(r.asDict().get(c) for c in cols)
            for r in layout.read_snapshot(spark, a).collect()
        )
        want_model = sorted(
            (k, v, x) if evolved else (k, v)
            for k, (v, x) in model.items()
        )
        assert got == want_live == want_model, f"seed {seed}"


def test_store_apply_stream_type_conflict_fails_loudly(spark, tmp_path):
    """Round-12 type guard pinned at the streaming consumer: a change
    batch whose carried column arrives RETYPED (val as BIGINT against a
    STRING store column) must fail the stream with the typed plan-build
    error — never the silent coerce-and-retype or a raw mid-batch CAST
    abort — and the replica store must stay at its pre-batch version."""
    from pyspark.sql import types as T

    from chess_pos_db_spark.plans import layout
    from chess_pos_db_spark.streaming import jobs

    store = str(tmp_path / "type_stream_store")
    src = str(tmp_path / "type_stream_chg")
    layout.append_versioned(
        spark.createDataFrame([(1, "a")], "k long, val string"),
        store, ["k"],
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("val", T.LongType()),  # retyped vs store STRING
            T.StructField("op", T.StringType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    spark.createDataFrame(
        [(1, 99, "U", 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="type\\(s\\) conflict"):
        jobs.store_apply_stream(
            spark, src, schema, store, ["k"], seq_col="seq"
        )
    m = layout.read_manifest(store)
    assert max(s["id"] for s in m["snapshots"]) == 1
    assert sorted(
        tuple(r) for r in layout.read_snapshot(spark, store).collect()
    ) == [(1, "a")]


@pytest.mark.slow
def test_store_apply_stream_refuses_rebase_log_until_reseeded(spark, tmp_path):
    """A changelog carrying a schema-break REBASE (evolve_schema) must
    refuse to stream into an upsert fold — the rebase's 'I' rows would
    leave pre-break column values in place, a silently mixed-schema
    replica. Recovery is the documented recipe: re-seed via
    replay_changelog, then resume with rebase_floor — post-break deltas
    stream normally and the replica equals the source."""
    from chess_pos_db_spark.plans import layout
    from chess_pos_db_spark.streaming import jobs
    from pyspark.sql import types as T

    a = str(tmp_path / "rb_src")
    out = str(tmp_path / "rb_log")
    b = str(tmp_path / "rb_replica")
    layout.append_versioned(
        spark.createDataFrame(
            [(1, "a", "t1"), (2, "b", "t2")], "k long, src string, txt string"
        ),
        a, ["k"],
    )
    layout.evolve_schema(spark, a, renames={"src": "origin"}, drops=["txt"])
    layout.upsert_rows(
        spark, a,
        spark.createDataFrame(
            [(2, "B", "U"), (3, "c", "I")], "k long, origin string, op string"
        ),
    )
    assert layout.export_changes(spark, a, out, ["k"]) == [1, 2, 3]

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("origin", T.StringType()),
            T.StructField("to_version", T.IntegerType()),
        ]
    )
    layout.append_versioned(
        spark.createDataFrame([], "k long, origin string"), b, ["k"]
    )
    with pytest.raises(ValueError, match=r"rebase version\(s\) \[2\]"):
        jobs.store_apply_stream(
            spark, f"{out}/changes", schema, b, ["k"], seq_col="to_version"
        )

    # re-seed at the rebase, declare the floor, stream the tail
    b2 = str(tmp_path / "rb_replica2")
    seed = layout.replay_changelog(spark, out, ["k"], to_version=2)
    layout.append_versioned(seed, b2, ["k"])
    live = jobs.store_apply_stream(
        spark, f"{out}/changes", schema, b2, ["k"],
        seq_col="to_version", rebase_floor=2,
    )
    # the at-least-once file source replays v1/v2's files too; the
    # upsert fold converges them (v1's old-schema columns would fail —
    # so the tail stream reads only versions > floor in production; at
    # this fixture scale the v1 dir's columns are absent from the
    # declared schema and read as NULLs, which seq resolution discards
    # in favor of the later versions)
    want = sorted(
        tuple(r) for r in layout.read_snapshot(spark, a).collect()
    )
    assert sorted(tuple(r) for r in live.select("k", "origin").collect()) == want


def test_store_apply_stream_refuses_rekey_log(spark, tmp_path):
    """Round-13: a REKEY break (rekey_store) rides the same rebase
    machinery, so its changelog marker must trigger the same streaming
    refusal — an upsert fold keyed on the OLD identity would silently
    diverge. The refusal names the rekey's version; rebase_floor
    past it lifts the guard."""
    from chess_pos_db_spark.plans import layout
    from chess_pos_db_spark.streaming import jobs
    from pyspark.sql import types as T

    a = str(tmp_path / "rk_src")
    out = str(tmp_path / "rk_log")
    b = str(tmp_path / "rk_replica")
    layout.append_versioned(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, src string, v long"
        ),
        a, ["k"],
    )
    layout.rekey_store(spark, a, ["src", "k"])
    assert layout.export_changes(spark, a, out, ["k"]) == [1, 2]

    schema = T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("k", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("to_version", T.IntegerType()),
        ]
    )
    layout.append_versioned(
        spark.createDataFrame([], "src string, k long, v long"),
        b, ["src", "k"],
    )
    with pytest.raises(ValueError, match=r"rebase version\(s\) \[2\]"):
        jobs.store_apply_stream(
            spark, f"{out}/changes", schema, b, ["src", "k"],
            seq_col="to_version",
        )
