"""Structured Streaming jobs (SURVEY.md §2.9 T1/T5/T6/T7).

The reference's `append` command is micro-batching avant la lettre:
new game files arrive, each import writes new sorted runs, queries see
the union, `merge` compacts. The streaming jobs here reproduce that
architecture natively:

- `read_events_stream`      — file-source stream over events parquet
                              (T1 incremental ingest);
- `run_available_now`       — drive a streaming query to completion
                              synchronously (Trigger.AvailableNow) into
                              a memory sink, for batch-equivalence
                              checks;
- `incremental_ingest`      — foreachBatch: each micro-batch is
                              pre-aggregated and appended as a new run;
                              `compact` (plans/layout.py) then merges
                              runs — exactly append+merge (T7 stateful
                              upsert, reference-style);
- watermarking + streaming dedup helpers (T5/T6).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans import layout

# Schema of an engine-written events directory (ts is a real timestamp;
# the TIMESTAMP_NANOS quirk applies only to the driver's original
# fixture file, which tables.t() normalizes on batch read).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over an events directory, one file per
    micro-batch (the reference's one-import-per-new-file cadence)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def run_available_now(result: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Run a streaming result to completion; return the sink contents.

    The memory-sink temp view is MATERIALIZED (driver collect — this
    is a drive-to-completion test/tool helper, sinks are small) and
    dropped before returning: each sink_<hex> view otherwise retains
    its full result set on the driver for the SparkSession lifetime,
    growing without bound across calls."""
    name = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = result.sparkSession
    sink = spark.sql(f"SELECT * FROM {name}")
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(name)
    return out


def with_watermark(e: DataFrame, delay: str = "1 hour") -> DataFrame:
    """T5 — bound state/late data; identical expression batch-side is a
    no-op, which the equivalence test exploits."""
    return e.withWatermark("ts", delay)


def dedup_stream(e: DataFrame) -> DataFrame:
    """T6 — streaming exactly-once emission per event_id."""
    return e.dropDuplicates(["event_id"])


def _prune_stale_epochs(base_dir: str, epoch_id: int) -> None:
    """Remove epoch=N run directories with N > the epoch being applied.

    The epoch-keyed overwrite makes SAME-epoch replay idempotent, but a
    wiped checkpoint renumbers from 0: a rerun that produces FEWER
    batches than the original (source files removed/merged) would leave
    the original's high-numbered epoch dirs in place, and the
    compaction/merge over the store would silently double-count their
    rows. During normal operation no dir above the current epoch can
    exist (a crashed future batch is replayed and overwrites itself),
    so anything higher is stale by construction."""
    import os
    import shutil

    if "://" in base_dir:
        # same silent-local-FS failure class _require_local guards in
        # the importer: os.path.isdir is always False on a remote URI,
        # so the wiped-checkpoint double-count protection would quietly
        # not apply — reject loudly instead of no-opping
        raise ValueError(
            f"_prune_stale_epochs: {base_dir!r} is a remote URI — the "
            "incremental_ingest/streaming_cms sink maintenance path "
            "requires a local filesystem dir (stale-epoch pruning is a "
            "local-FS operation)"
        )
    if not os.path.isdir(base_dir):
        return
    for entry in os.listdir(base_dir):
        if entry.startswith("epoch="):
            try:
                n = int(entry.split("=", 1)[1])
            except ValueError:
                continue
            if n > epoch_id:
                shutil.rmtree(os.path.join(base_dir, entry))


def incremental_ingest(
    spark: SparkSession,
    src_dir: str,
    runs_dir: str,
    compacted_dir: str,
) -> DataFrame:
    """T1+T7: reference append+merge as a streaming job.

    Each micro-batch is pre-aggregated (the import buffer combine) and
    appended as a new sorted run; after the stream drains, runs are
    compacted into one sorted table. Returns the compacted DataFrame.
    """
    events = read_events_stream(spark, src_dir)

    def store_batch(batch_df: DataFrame, epoch_id: int) -> None:
        agg = batch_df.groupBy("user_id", "event_type").agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        # epoch-keyed OVERWRITE, not a blind append: foreachBatch is
        # at-least-once, so a replayed batch must land in the same
        # epoch=N directory (replacing itself) or the compacted
        # aggregate double-counts it. The epoch partition column is
        # dropped by compact_runs' groupBy. Stale HIGHER epochs from a
        # wiped-checkpoint rerun are pruned first (see helper).
        _prune_stale_epochs(runs_dir, int(epoch_id))
        # scale-adaptive run sizing (guide §2/§6): AQE sizes the
        # per-epoch run from actual batch bytes instead of a constant
        # tuned for fixture-sized micro-batches.
        (
            layout.range_partitioned(agg, ["user_id", "event_type"], None)
            .sortWithinPartitions("user_id", "event_type")
            .write.mode("overwrite")
            .parquet(f"{runs_dir}/epoch={int(epoch_id)}")
        )

    q = (
        events.writeStream.foreachBatch(store_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", runs_dir + "_chk")
        .start()
    )
    q.awaitTermination()

    return layout.compact_runs(
        spark,
        [runs_dir],
        compacted_dir,
        key=["user_id", "event_type"],
        agg_spec={
            "cnt": "sum",
            "sum_value": "sum",
            "first_event": "min",
            "last_event": "max",
        },
    )


def stateful_running_stats(e: DataFrame) -> DataFrame:
    """T7 (custom stateful operator form): per-event_type running
    {cnt, sum_value} maintained in explicit keyed state via
    ``applyInPandasWithState`` — the arbitrary-stateful analogue of the
    reference's in-memory entry accumulators that survive across
    micro-batches (import buffer + append cycle).

    Emits the updated running totals for every key touched by each
    micro-batch (output mode "update"); state is one (long, double) pair
    per key, so state size is bounded by key cardinality regardless of
    stream length.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_fn(key, pdfs, state):
        if state.exists:
            cnt, sum_value = state.get
        else:
            cnt, sum_value = 0, 0.0
        for pdf in pdfs:
            cnt += int(len(pdf))
            sum_value += float(pdf["value"].sum())
        state.update((cnt, sum_value))
        yield pd.DataFrame(
            {"event_type": [key[0]], "cnt": [cnt], "sum_value": [sum_value]}
        )

    # prune to (event_type, value) before the Python boundary (guide
    # §4.2): applyInPandasWithState is opaque to Catalyst, so without
    # the select every event column (ts, user_id, page, ...) would be
    # Arrow-shipped into the state function, which only reads `value`.
    return e.select("event_type", "value").groupBy("event_type").applyInPandasWithState(
        update_fn,
        outputStructType="event_type string, cnt long, sum_value double",
        stateStructType="cnt long, sum_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def purchase_attribution(
    signups: DataFrame, purchases: DataFrame, delay: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join (T-block: the two-stream shape):
    attribute each purchase to the user's signup when it happens within
    7 days AFTER that signup.

    Both sides carry watermarks and the join condition bounds the event
    time range, so Spark can evict join state once the watermark passes
    `delay` + the interval — state is O(events in the retention window),
    not O(stream history). `delay` is the out-of-orderness bound: rows
    arriving more than `delay` behind the observed max event time are
    dropped, exactly like any watermarked op (the equivalence test uses
    a delay covering the fixture's span because its micro-batches are
    NOT time-ordered; a production deployment tunes it to real arrival
    skew). The identical expression over two batch frames is the
    equivalence oracle (watermark is a batch no-op).
    """
    return _attribution_join(signups, purchases, delay, "inner")


def purchase_attribution_outer(
    signups: DataFrame, purchases: DataFrame, delay: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every signup emits, with
    NULL purchase columns when no purchase lands in its 7-day window —
    the "which signups never converted" stream.

    The outer side is the hard state-management case: the engine may
    only emit the null-padded row once the watermark proves no matching
    purchase can still arrive (signup_ts + interval + delay has
    passed), so results trickle out as event time advances rather than
    at join time. Same eviction bound as the inner form; the batch
    twin (watermark a no-op, outer join immediate) is the equivalence
    oracle in tests/test_streaming.py.
    """
    return _attribution_join(signups, purchases, delay, "left_outer")


def _attribution_join(
    signups: DataFrame, purchases: DataFrame, delay: str, how: str
) -> DataFrame:
    """One definition of the attribution window for both join types —
    the projections, watermarks, and 7-day interval condition must
    never drift between the inner and outer forms."""
    s = (
        signups.filter(F.col("event_type") == "signup")
        .withWatermark("ts", delay)
        .select(F.col("user_id"), F.col("ts").alias("signup_ts"))
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", delay)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
    )
    return s.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")
        ),
        how,
    ).select("user_id", "signup_ts", "purchase_ts", "value")


def stateful_running_stats_tws(e: DataFrame) -> DataFrame:
    """T7 on the Spark 4 state API: the same per-event_type running
    {cnt, sum_value} operator as ``stateful_running_stats``, expressed
    with ``transformWithStateInPandas`` (StatefulProcessor + ValueState)
    — the successor API whose explicit state variables map to RocksDB
    column families, giving per-variable TTL/eviction instead of one
    opaque state tuple. Same bounded-state argument: one (long, double)
    pair per key.

    Environment note: the TWS state-server protocol requires
    ``google.protobuf`` (broken in this container — the equivalence
    test skips when the import fails); ``stateful_running_stats`` is
    the always-runnable form of the same operator. The query also needs
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider — set it on the session before starting.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "cnt long, sum_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            cnt, sum_value = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                cnt += int(len(pdf))
                sum_value += float(pdf["value"].sum())
            self._state.update((cnt, sum_value))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "cnt": [cnt],
                    "sum_value": [sum_value],
                }
            )

        def close(self) -> None:
            pass

    # same §4.2 prune as stateful_running_stats: only (event_type,
    # value) cross the Python boundary.
    return e.select("event_type", "value").groupBy("event_type").transformWithStateInPandas(
        RunningStats(),
        outputStructType="event_type string, cnt long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-STATIC dimension enrichment: join the event stream to a
    batch dimension table. Spark broadcasts the static side into every
    micro-batch (no stream-side state, no watermark needed — unlike
    stream-stream joins); the batch twin is the identical expression,
    which the equivalence test exploits. The 100 TB posture is the
    same as join_dim_chain: the fact stream never shuffles for the
    join."""
    d = F.broadcast(
        dim.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return (
        events.join(d, "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def streaming_cms(
    spark: SparkSession, src_dir: str, cells_dir: str
) -> DataFrame:
    """Streaming Count-Min maintenance: each micro-batch's token stream
    is sketched (d×w cells, map-side combined inside the batch) and the
    per-batch cells APPENDED to the cells store; the live sketch at any
    moment is `SUM(cnt) GROUP BY (i, col)` over the store — the
    mergeability property doing the work (llm/mining.py cms_cells). No
    per-key streaming state: the sketch's fixed 2048-cell footprint IS
    the state, which is why a CMS is the streaming answer to "frequency
    of anything seen so far" at 100 TB/day ingest rates. Periodic
    compaction of the store is compact_runs with agg sum (same merge).

    Returns the merged sketch after draining (availableNow).
    """
    from ..llm.mining import cms_cells

    events = read_events_stream(spark, src_dir)

    def sketch_batch(batch_df: DataFrame, epoch_id: int) -> None:
        occ = batch_df.select(F.col("event_type").alias("token"))
        # epoch-keyed overwrite: an at-least-once replay re-lands the
        # same cells instead of appending them twice, which would
        # silently push estimates past the eps*N guarantee; stale
        # higher epochs from a wiped-checkpoint rerun are pruned first
        _prune_stale_epochs(cells_dir, int(epoch_id))
        cms_cells(occ).write.mode("overwrite").parquet(
            f"{cells_dir}/epoch={int(epoch_id)}"
        )

    q = (
        events.writeStream.foreachBatch(sketch_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", cells_dir + "_chk")
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(cells_dir)
        .groupBy("i", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _versioned_apply_stream(
    spark: SparkSession,
    src_dir: str,
    changes_schema: T.StructType,
    store_dir: str,
    seed_write,
    apply_fn,
) -> DataFrame:
    """Shared versioned-store foreachBatch harness (cdc_apply_stream /
    ivm_apply_stream): each micro-batch turns store v{n} into v{n+1}
    via ``apply_fn(current, batch) -> merged`` and the _LATEST pointer
    swaps atomically, so readers never see a half-applied batch.

    Idempotence under at-least-once replay: the pointer records the
    LAST APPLIED EPOCH and a FINGERPRINT of that batch's input files
    alongside the version ("<v> <epoch> <fp>"); a replayed batch (same
    epoch_id, delivered again because the crash hit between the
    pointer swap and the checkpoint's offset commit) is skipped
    instead of re-applied — without this, non-idempotent merges (IVM's
    +insert/-delete deltas) would corrupt the view. A crash BEFORE the
    pointer swap re-runs the batch against the same v{n},
    deterministically overwriting the orphan v{n+1}.

    The fingerprints close the other half of the epoch-only guard: if
    the CHECKPOINT is wiped while the store's _LATEST persists (the
    documented recovery flow) and new change files have landed since,
    the restarted availableNow batch 0 contains those NEW changes but
    carries an already-seen epoch — an epoch-only skip would silently
    drop them. The pointer records TWO input-file fingerprints: the
    last applied batch's file set (matches a crash-window re-delivery
    of that one batch) and an order-independent XOR digest of EVERY
    file ever applied (matches a wiped-checkpoint batch 0 that
    re-bundles the full history in one batch — multi-epoch stores
    recover silently, not with a false alarm, and the accepted
    recovery batch rewrites the pointer so the store's epoch counter
    realigns with the NEW checkpoint's numbering: the next genuinely
    new batch applies instead of tripping the guard). A replayed epoch
    matching NEITHER carries data the store has never applied and
    fails loudly (wipe checkpoint and store together, or let the
    checkpoint resume). File paths come from an input_file_name()
    probe per batch (inputFiles() returns [] inside foreachBatch; the
    probe reads parquet footers only — see _batch_fps).

    Stores whose _LATEST predates fingerprint tracking carry an
    UNKNOWN cumulative digest ("?" in the pointer, propagated — never
    fabricated from a partial post-upgrade history): their replayed
    epochs skip silently exactly as the epoch-only guard they were
    created under did, and a wiped-checkpoint recovery whose batch
    differs from the last applied one fails with an honest
    "cannot verify" instead of a false "different input set".
    """
    import hashlib
    import os

    if "://" in store_dir:
        # the _LATEST pointer discipline (atomic tmp+replace, existence
        # probe, version-dir paths) is os-module local-FS code: on a
        # remote URI os.path.exists is always False, so every restart
        # would silently re-seed v1 and orphan the real store — reject
        # loudly, like _prune_stale_epochs does
        raise ValueError(
            f"versioned apply stream: {store_dir!r} is a remote URI — "
            "the _LATEST pointer protocol requires a local store dir"
        )
    latest_path = os.path.join(store_dir, "_LATEST")

    def _batch_fps(batch_df: DataFrame) -> tuple[str, int]:
        """(sha256 of the sorted path list, XOR of per-path hashes).

        batch_df.inputFiles() would be free but returns [] inside
        foreachBatch (the micro-batch frame is not backed by the file
        relation), so the paths come from an input_file_name() probe —
        a column-pruned job that reads ZERO data columns (parquet
        footer metadata only), not a second scan of the batch."""
        paths = sorted(
            r[0]
            for r in batch_df.select(
                F.input_file_name().alias("p")
            ).distinct().collect()
        )
        digest = hashlib.sha256("\n".join(paths).encode()).hexdigest()[:16]
        xor = 0
        for p in paths:
            xor ^= int.from_bytes(
                hashlib.sha256(p.encode()).digest()[:8], "big"
            )
        return digest, xor

    def _read_latest() -> tuple[int, int, str | None, int | None]:
        # cum_xor None = UNKNOWN history (pre-fingerprint pointer, or
        # the explicit "?" a post-upgrade apply propagates) — distinct
        # from 0, the genuine XOR identity of an empty history.
        with open(latest_path) as f:
            parts = f.read().split()
        return (
            int(parts[0]),
            (int(parts[1]) if len(parts) > 1 else -1),
            (parts[2] if len(parts) > 2 else None),
            (
                int(parts[3], 16)
                if len(parts) > 3 and parts[3] != "?"
                else None
            ),
        )

    def _write_latest(
        v: int, epoch: int, fp: str = "-", cum_xor: int | None = 0
    ) -> None:
        tmp = latest_path + ".tmp"
        xor_field = "?" if cum_xor is None else f"{cum_xor:016x}"
        with open(tmp, "w") as f:
            f.write(f"{v} {epoch} {fp} {xor_field}")
        os.replace(tmp, latest_path)  # atomic pointer swap

    os.makedirs(store_dir, exist_ok=True)
    if not os.path.exists(latest_path):
        seed_write(os.path.join(store_dir, "v1"))
        _write_latest(1, -1)

    changes = spark.readStream.schema(changes_schema).parquet(src_dir)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        v, last_epoch, last_fp, cum_xor = _read_latest()
        if int(epoch_id) <= last_epoch:
            # at-least-once replay of an already-applied batch — but
            # only if the store has actually applied this data: a
            # wiped checkpoint restarts at epoch 0, and if new change
            # files landed the "replay" silently carries unapplied
            # rows. Accept a re-delivery of the last batch (crash
            # between pointer swap and offset commit) OR a batch 0
            # re-bundling exactly the full applied history.
            if last_fp not in (None, "-"):
                fp, xor = _batch_fps(batch_df)
                if fp != last_fp:
                    if cum_xor is None:
                        raise RuntimeError(
                            f"versioned store {store_dir!r}: epoch "
                            f"{epoch_id} replays a batch that differs "
                            f"from the last applied one, and the "
                            f"store's pointer predates cumulative-"
                            f"digest tracking — recovery cannot be "
                            f"verified; wipe the checkpoint and the "
                            f"store together"
                        )
                    if xor != cum_xor:
                        raise RuntimeError(
                            f"versioned store {store_dir!r}: epoch "
                            f"{epoch_id} replays with a DIFFERENT "
                            f"input file set than anything recorded "
                            f"at apply time — the stream checkpoint "
                            f"was reset while the store pointer "
                            f"persisted and new changes have since "
                            f"landed; wipe the checkpoint and the "
                            f"store together"
                        )
                # accepted recovery/replay: realign the pointer to the
                # NEW checkpoint's epoch numbering (and record this
                # batch as the last delivered one), so the next
                # genuinely new batch — epoch last+1 under the new
                # counter — applies instead of hitting the replay path
                # forever with last_epoch stuck at its pre-wipe value.
                if int(epoch_id) != last_epoch or fp != last_fp:
                    _write_latest(v, int(epoch_id), fp, cum_xor)
            return
        cur = spark.read.parquet(os.path.join(store_dir, f"v{v}"))
        merged = apply_fn(cur, batch_df)
        merged.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"v{v + 1}")
        )
        fp, xor = _batch_fps(batch_df)
        _write_latest(
            v + 1,
            int(epoch_id),
            fp,
            None if cum_xor is None and last_epoch >= 0 else (cum_xor or 0) ^ xor,
        )

    q = (
        changes.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_dir + "_chk")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(
        os.path.join(store_dir, f"v{_read_latest()[0]}")
    )


def cdc_apply_stream(
    spark: SparkSession,
    src_dir: str,
    changes_schema: T.StructType,
    store_dir: str,
    seed_df: DataFrame,
    key: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    allow_new_columns: bool = False,
    partial_updates: bool = True,
) -> DataFrame:
    """Streaming CDC upsert: each micro-batch of change rows is applied
    to the store through operators/merge.merge_changes (the SAME plan
    batch MERGE INTO uses), producing a new immutable store version —
    read-side never sees a half-applied batch.
    ``allow_new_columns=True`` opts the replica into the source's
    additive schema evolution: change columns the replica lacks are
    added as typed NULLs before the merge (merge_changes' evolution
    mode) — without it the first evolved changeset fails the batch
    loudly, by design. Pass ``partial_updates=False`` when the stream
    carries full-STATE rows (an export_changes log shipped as files):
    a NULL payload there means the value became NULL, and the default
    intent-feed coalesce would keep the replica's stale value.

    Recovery contract: batch delivery is at-least-once across restarts;
    a CDC merge is idempotent by construction AND the shared harness
    additionally skips already-applied epochs (pinned in
    tests/test_streaming.py). At scale each version is metadata plus
    the merged files; GC of old versions is the compaction job's
    concern (plans/layout.compact_versioned is the same pattern).

    Returns the final store DataFrame after draining (availableNow).
    """
    from ..operators.merge import merge_changes

    return _versioned_apply_stream(
        spark,
        src_dir,
        changes_schema,
        store_dir,
        seed_write=lambda d: seed_df.write.mode("overwrite").parquet(d),
        apply_fn=lambda cur, batch: merge_changes(
            cur, batch, key, op_col, seq_col,
            allow_new_columns=allow_new_columns,
            partial_updates=partial_updates,
        ),
    )


def ivm_apply_stream(
    spark: SparkSession,
    src_dir: str,
    changes_schema: T.StructType,
    store_dir: str,
    seed_base: DataFrame,
    key: list[str],
    val: str,
    op_col: str = "op",
) -> DataFrame:
    """Streaming incremental view maintenance: a change stream of
    (+row / -row) events keeps a stored (cnt, total) aggregate view
    current — operators/ivm.maintain_agg_view inside foreachBatch on
    the shared versioned-store harness. The true streaming
    materialized view: each micro-batch costs one shuffle over the
    BATCH (partial-agg of its rows), never a base rescan.

    The +insert/-delete delta application is NOT idempotent, so the
    harness's epoch-skip is load-bearing here: an at-least-once replay
    would otherwise double-apply the deltas (doubled counts; re-applied
    deletes silently vanishing live groups through the cnt>0 filter).

    Change rows: key columns + ``val`` + op ∈ {'I','D'}. Any other op
    (a CDC-style 'U', a lowercase 'd', a NULL) would match NEITHER
    filter and silently drop the delta — the view then diverges from
    recompute with no error anywhere. Malformed ops fail loudly
    instead, woven into the op column exactly like merge_changes'
    guard so Catalyst cannot prune it.
    """
    from ..operators.ivm import agg_view, maintain_agg_view

    def apply(view: DataFrame, batch: DataFrame) -> DataFrame:
        guarded = batch.withColumn(
            op_col,
            F.when(
                F.col(op_col).isin("I", "D"), F.col(op_col)
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("ivm_apply_stream: unknown op "),
                        F.coalesce(F.col(op_col), F.lit("NULL")),
                        F.lit(" — ops must be 'I' or 'D'"),
                    )
                )
            ),
        )
        return maintain_agg_view(
            view,
            key,
            val,
            inserts=guarded.filter(F.col(op_col) == "I"),
            deletes=guarded.filter(F.col(op_col) == "D"),
        )

    return _versioned_apply_stream(
        spark,
        src_dir,
        changes_schema,
        store_dir,
        seed_write=lambda d: agg_view(seed_base, key, val)
        .write.mode("overwrite")
        .parquet(d),
        apply_fn=apply,
    )


def store_apply_stream(
    spark: SparkSession,
    src_dir: str,
    changes_schema: T.StructType,
    store_path: str,
    key: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    max_files_per_trigger: int | None = None,
    allow_new_columns: bool = False,
    rebase_floor: int | None = None,
) -> DataFrame:
    """Streaming CDC ingestion INTO the manifest-versioned store
    (plans/layout): each micro-batch of change rows merges via
    `layout.upsert_rows` — copy-on-write at touched-file cost, one new
    snapshot version per non-empty batch. The store keeps every
    capability it has in batch: snapshot isolation for concurrent
    readers, time travel, tags, export_changes downstream, scheduled
    maintain_stores health. ``allow_new_columns=True`` lets the replica
    follow the source's additive schema evolution (upsert_rows'
    evolution mode) — without it the first evolved batch fails loudly,
    by design.

    NON-additive evolution cannot stream through an upsert fold: a
    schema-break REBASE version (layout.evolve_schema → export_changes
    `_rebase.json` marker) carries full 'I' snapshots whose upsert
    against a pre-break replica would leave the renamed/dropped
    columns' stale values in place — a silently mixed-schema replica.
    The stream therefore REFUSES TO START when the source directory
    contains a rebase marker, with the recovery recipe in the error:
    re-seed the replica (`layout.replay_changelog` folds rebases in
    batch) and resume with ``rebase_floor=<break version>``, which
    declares markers at or below that version already folded into the
    seed. The same posture as a forced-gap re-seed: a log that changed
    shape is a bootstrap event, not a delta.

    A micro-batch can mix several logical versions of one key (the
    at-least-once file source bundles whatever arrived); with
    ``seq_col`` the LATEST change per key wins before the merge
    (row_number over seq desc — the cdc_apply_stream resolution rule);
    without it, conflicting rows for a key fail the batch loudly via
    upsert_rows' guard.

    Recovery contract: delivery is at-least-once across restarts, and
    a REPLAYED batch converges — U re-applies to the same value, I
    re-replaces, D re-no-ops — producing a new version with identical
    logical content (harmless; compaction/vacuum reclaim it). No
    _LATEST pointer is needed: the manifest IS the commit record.
    Returns the live store DataFrame after draining (availableNow).
    """
    import re as _re

    from pyspark.sql.window import Window

    # Rebase scan through the Hadoop FileSystem API so the refusal
    # fires for OBJECT-STORE changelogs too (s3a://, abfs://, ...) —
    # a local-only os.glob silently streamed remote rebases through,
    # producing exactly the mixed-schema replica this guard exists to
    # prevent (round-13 ADVICE fix). The same code path serves local
    # paths (RawLocalFileSystem).
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    rebases = []
    if fs.exists(hpath):
        statuses = fs.globStatus(
            jvm.org.apache.hadoop.fs.Path(
                src_dir.rstrip("/") + "/to_version=*/_rebase.json"
            )
        )
        for st in statuses or []:
            mt = _re.search(r"to_version=(\d+)", st.getPath().toString())
            if mt:
                rebases.append(int(mt.group(1)))
    pending = sorted(
        v for v in rebases if rebase_floor is None or v > rebase_floor
    )
    if pending:
        raise ValueError(
            f"store_apply_stream: changelog at {src_dir!r} contains "
            f"rebase version(s) {pending} (schema break or log "
            "compaction) — an upsert fold across a rebase is not a "
            "delta apply (a schema break would silently leave "
            "pre-break column values in place). Re-seed the replica "
            "from the rebase (layout.replay_changelog handles it in "
            f"batch) and resume with rebase_floor={max(pending)}"
        )

    reader = spark.readStream.schema(changes_schema)
    if max_files_per_trigger is not None:
        # version-per-source-file cadence (availableNow otherwise
        # bundles everything already present into one batch/version)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    changes = reader.parquet(src_dir)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = batch_df
        if seq_col is not None:
            w = Window.partitionBy(*key).orderBy(F.col(seq_col).desc())
            b = (
                b.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", seq_col)
            )
        layout.upsert_rows(
            spark, store_path, b, op_col=op_col,
            allow_new_columns=allow_new_columns,
        )

    q = (
        changes.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "_chk")
        .start()
    )
    q.awaitTermination()
    return layout.read_snapshot(spark, store_path)
