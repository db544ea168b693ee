"""Incremental view maintenance (operators/ivm.py): delta application
must equal full recomputation, fully-retracted groups must vanish, and
the maintenance plan must touch only the delta (never rescan base)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from chess_pos_db_spark.operators.ivm import agg_view, maintain_agg_view


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_full_retraction_removes_group(spark):
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, v long"
    )
    view = agg_view(base, ["k"], "v")
    updated = maintain_agg_view(
        view, ["k"], "v", deletes=base.filter("k = 'b'")
    )
    assert _rows(updated) == [("a", 2, 3)]


def test_maintenance_never_rescans_base(spark):
    """The updated-view plan must not contain the base table scan —
    only the prior view and the deltas feed it. Feed the view in from
    parquet (as a real deployment would) and check the scan list."""
    import os

    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, v long"
    )
    tmp = "/tmp/ivm_view_store"
    agg_view(base, ["k"], "v").write.mode("overwrite").parquet(tmp)
    view = spark.read.parquet(tmp)
    ins = spark.createDataFrame([("c", 7)], "k string, v long")
    updated = maintain_agg_view(view, ["k"], "v", inserts=ins)
    plan = updated._jdf.queryExecution().executedPlan().toString()
    # exactly one file scan (the stored view); the in-memory deltas are
    # LocalTableScan; the base never appears
    assert plan.count("FileScan") == 1
    assert _rows(updated) == [("a", 2, 3), ("b", 1, 5), ("c", 1, 7)]


_batch = st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(0, 9)), max_size=8
)


@settings(max_examples=10, deadline=None)
@given(_batch, _batch)
def test_ivm_equals_recompute(ins, dels):
    """Random insert batch + random delete batch (deletes drawn from
    the base ∪ inserts multiset) — maintained view == recomputed view."""
    spark = _SPARK[0]
    base_rows = [("a", 1), ("a", 4), ("b", 2), ("c", 3)]
    # deletes must actually exist in the final multiset; take them from
    # base+ins by index to keep the scenario well-formed
    pool = base_rows + ins
    dels_real = [pool[i % len(pool)] for i, _ in enumerate(dels)][: len(pool)]
    # remove duplicates by position, each pool element at most once
    seen_idx = set()
    chosen = []
    for i, _ in enumerate(dels):
        j = i % len(pool)
        if j not in seen_idx:
            seen_idx.add(j)
            chosen.append(pool[j])
    base = spark.createDataFrame(base_rows, "k string, v long")
    view = agg_view(base, ["k"], "v")
    kwargs = {}
    if ins:
        kwargs["inserts"] = spark.createDataFrame(ins, "k string, v long")
    if chosen:
        kwargs["deletes"] = spark.createDataFrame(chosen, "k string, v long")
    updated = maintain_agg_view(view, ["k"], "v", **kwargs)

    remaining = base_rows + ins
    for d in chosen:
        remaining.remove(d)
    if remaining:
        expect = agg_view(
            spark.createDataFrame(remaining, "k string, v long"), ["k"], "v"
        )
        assert _rows(updated) == _rows(expect)
    else:
        assert updated.count() == 0


_SPARK = []


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    _SPARK.clear()
    _SPARK.append(spark)


def test_ivm_stream_equals_recompute(spark, tmp_path):
    """Streaming IVM: a change stream of +/- events maintains the view
    to exactly the recomputed aggregate of the final base state."""
    from pyspark.sql import types as T
    from chess_pos_db_spark.streaming import jobs

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    src = str(tmp_path / "changes")
    store = str(tmp_path / "view")
    base_rows = [("a", 1), ("a", 4), ("b", 2)]
    base = spark.createDataFrame(base_rows, "k string, v long")

    b1 = [("c", 7, "I"), ("a", 1, "D")]
    b2 = [("b", 2, "D"), ("c", 3, "I")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    final = jobs.ivm_apply_stream(
        spark, src, schema, store, base, ["k"], "v"
    )
    got = sorted(tuple(r) for r in final.collect())
    # final base: a:4, c:7, c:3  (b fully retracted)
    assert got == [("a", 1, 4), ("c", 2, 10)]


@pytest.mark.slow
def test_ivm_stream_replay_does_not_double_apply(spark, tmp_path):
    """At-least-once replay guard: re-running the SAME change batches
    against the SAME store (fresh checkpoint — every batch is
    redelivered, the worst-case replay) must leave the view untouched.
    Without the harness's last-applied-epoch skip, the +insert/-delete
    deltas would apply twice: counts doubled, re-applied deletes
    silently vanishing live groups through the cnt>0 filter."""
    import shutil

    from pyspark.sql import types as T
    from chess_pos_db_spark.streaming import jobs

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    src = str(tmp_path / "changes")
    store = str(tmp_path / "view")
    base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    spark.createDataFrame(
        [("c", 7, "I"), ("b", 2, "D")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    first = sorted(
        tuple(r)
        for r in jobs.ivm_apply_stream(
            spark, src, schema, store, base, ["k"], "v"
        ).collect()
    )
    assert first == [("a", 1, 1), ("c", 1, 7)]

    # simulate redelivery of every batch: wipe the checkpoint, rerun
    shutil.rmtree(store + "_chk")
    replayed = sorted(
        tuple(r)
        for r in jobs.ivm_apply_stream(
            spark, src, schema, store, base, ["k"], "v"
        ).collect()
    )
    assert replayed == first  # no double-apply, no vanished groups


@pytest.mark.slow
def test_ivm_stream_replay_with_new_data_fails_loudly(spark, tmp_path):
    """The epoch-only half of the replay guard is not enough: wipe the
    checkpoint (restart at epoch 0) AND land new change files, and the
    restarted batch 0 carries data the store has never applied while
    wearing an already-seen epoch. An epoch-only skip would silently
    DROP the new changes; the input-file fingerprint in the _LATEST
    pointer must turn that into a loud failure instead."""
    import shutil

    import pytest

    from pyspark.sql import types as T
    from chess_pos_db_spark.streaming import jobs

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    src = str(tmp_path / "changes")
    store = str(tmp_path / "view")
    base = spark.createDataFrame([("a", 1)], "k string, v long")
    spark.createDataFrame(
        [("c", 7, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    first = sorted(
        tuple(r)
        for r in jobs.ivm_apply_stream(
            spark, src, schema, store, base, ["k"], "v"
        ).collect()
    )
    assert first == [("a", 1, 1), ("c", 1, 7)]

    # wipe checkpoint, land NEW changes: batch 0 now has a different
    # input-file set than the recorded epoch-0 apply
    shutil.rmtree(store + "_chk")
    spark.createDataFrame(
        [("d", 9, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="DIFFERENT input"):
        jobs.ivm_apply_stream(spark, src, schema, store, base, ["k"], "v")


@pytest.mark.slow
def test_ivm_stream_multi_epoch_checkpoint_wipe_recovers(spark, tmp_path):
    """The guard must NOT false-alarm on the documented recovery flow
    when the store applied MORE than one epoch: a wiped checkpoint
    re-bundles the ENTIRE change history into one batch 0, whose file
    set differs from the last applied batch's — but matches the
    cumulative XOR digest of everything applied, so it is skipped
    silently and the view survives untouched."""
    import shutil

    from pyspark.sql import types as T
    from chess_pos_db_spark.streaming import jobs

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    src = str(tmp_path / "changes")
    store = str(tmp_path / "view")
    base = spark.createDataFrame([("a", 1)], "k string, v long")

    # epoch 0: first change file
    spark.createDataFrame(
        [("c", 7, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    jobs.ivm_apply_stream(spark, src, schema, store, base, ["k"], "v")
    # epoch 1 (checkpoint intact): second change file
    spark.createDataFrame(
        [("d", 9, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    second = sorted(
        tuple(r)
        for r in jobs.ivm_apply_stream(
            spark, src, schema, store, base, ["k"], "v"
        ).collect()
    )
    assert second == [("a", 1, 1), ("c", 1, 7), ("d", 1, 9)]

    # wipe ONLY the checkpoint, no new files: batch 0 = both files
    shutil.rmtree(store + "_chk")
    recovered = sorted(
        tuple(r)
        for r in jobs.ivm_apply_stream(
            spark, src, schema, store, base, ["k"], "v"
        ).collect()
    )
    assert recovered == second  # silent skip, no false alarm

    # the accepted recovery must REALIGN the epoch counter to the new
    # checkpoint's numbering: a genuinely new batch after recovery is
    # epoch 1 under the new counter, which a stale last_epoch=1 from
    # before the wipe would misread as a replay and fail loudly on —
    # permanently, since the failing batch never commits.
    spark.createDataFrame(
        [("e", 5, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    after = sorted(
        tuple(r)
        for r in jobs.ivm_apply_stream(
            spark, src, schema, store, base, ["k"], "v"
        ).collect()
    )
    assert after == [("a", 1, 1), ("c", 1, 7), ("d", 1, 9), ("e", 1, 5)]


@pytest.mark.slow
def test_ivm_stream_pre_upgrade_pointer_fails_honestly(spark, tmp_path):
    """A store whose _LATEST predates fingerprint tracking has an
    UNKNOWN applied-file history. A post-upgrade apply must propagate
    that unknown (never fabricate a cumulative digest from only the
    post-upgrade suffix), so a later wiped-checkpoint recovery fails
    with an honest 'cannot be verified' — not a false claim that the
    input set differs from what was applied."""
    import shutil

    import pytest

    from pyspark.sql import types as T
    from chess_pos_db_spark.streaming import jobs

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    src = str(tmp_path / "changes")
    store = str(tmp_path / "view")
    base = spark.createDataFrame([("a", 1)], "k string, v long")
    spark.createDataFrame(
        [("c", 7, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    jobs.ivm_apply_stream(spark, src, schema, store, base, ["k"], "v")

    # simulate a pre-upgrade pointer: version + epoch only
    latest = store + "/_LATEST"
    with open(latest) as f:
        v, epoch = f.read().split()[:2]
    with open(latest, "w") as f:
        f.write(f"{v} {epoch}")

    # post-upgrade apply of a second file (checkpoint intact)
    spark.createDataFrame(
        [("d", 9, "I")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    second = sorted(
        tuple(r)
        for r in jobs.ivm_apply_stream(
            spark, src, schema, store, base, ["k"], "v"
        ).collect()
    )
    assert second == [("a", 1, 1), ("c", 1, 7), ("d", 1, 9)]
    with open(latest) as f:
        assert f.read().split()[3] == "?"  # unknown propagated, not fabricated

    # wiped-checkpoint recovery re-bundles BOTH files: differs from the
    # last applied batch and the history digest is unknown
    shutil.rmtree(store + "_chk")
    with pytest.raises(Exception, match="cannot be verified"):
        jobs.ivm_apply_stream(spark, src, schema, store, base, ["k"], "v")


@pytest.mark.slow
def test_ivm_stream_rejects_unknown_ops(spark, tmp_path):
    """A change row whose op is not 'I'/'D' (a CDC 'U', a NULL) would
    match NEITHER delta filter and silently drop from the view — the
    view then diverges from recompute with no error anywhere. The op
    guard must fail the batch loudly instead."""
    from pyspark.sql import types as T

    from chess_pos_db_spark.streaming import jobs

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    base = spark.createDataFrame([("a", 1)], "k string, v long")
    for bad_rows, label in (
        ([("a", 2, "U")], "cdc U"),
        ([("a", 2, None)], "null op"),
    ):
        src = str(tmp_path / f"changes_{label.replace(' ', '_')}")
        store = str(tmp_path / f"view_{label.replace(' ', '_')}")
        spark.createDataFrame(bad_rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        with pytest.raises(Exception, match="unknown op"):
            jobs.ivm_apply_stream(spark, src, schema, store, base, ["k"], "v")


def test_versioned_apply_stream_rejects_remote_store(spark, tmp_path):
    """The _LATEST pointer protocol is local-FS code; a remote store
    URI must be rejected loudly, not silently re-seed v1 on every
    restart."""
    from pyspark.sql import types as T

    from chess_pos_db_spark.streaming import jobs

    schema = T.StructType([T.StructField("k", T.StringType())])
    base = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError, match="remote URI"):
        jobs.ivm_apply_stream(
            spark, str(tmp_path / "src"), schema,
            "s3a://bucket/view", base, ["k"], "v",
        )


@pytest.mark.slow
def test_ivm_multi_round_randomized_equals_recompute(spark):
    """Long-horizon IVM: the view maintained through SEEDED RANDOM
    sequences of insert/delete batches must equal recompute over the
    evolving base after EVERY round — the single-batch property test
    can't see cumulative effects (a guard misfiring after many
    combines, a group resurrected after full retraction). Integer
    values keep ± exact, so equality is strict, not rounded. Each
    round's view is localCheckpointed: maintenance must depend only on
    the PREVIOUS view + the delta, exactly as a stored view would."""
    import random

    for seed in range(3):
        rng = random.Random(10 + seed)
        keys = ["a", "b", "c", "d"]
        rows: list[tuple[str, int]] = [
            (rng.choice(keys), rng.randint(1, 9)) for _ in range(8)
        ]
        mk = lambda rs: spark.createDataFrame(rs, "k string, v long")
        view = agg_view(mk(rows), ["k"], "v").localCheckpoint(eager=True)

        for step in range(6):
            ins = [
                (rng.choice(keys), rng.randint(1, 9))
                for _ in range(rng.randint(0, 3))
            ]
            n_del = rng.randint(0, min(3, len(rows)))
            del_idx = rng.sample(range(len(rows)), n_del)
            dels = [rows[i] for i in del_idx]
            # a delete batch must reference actual base rows (the
            # negative-count guard exists to catch anything else)
            rows = [r for i, r in enumerate(rows) if i not in del_idx]
            rows += ins
            view = maintain_agg_view(
                view,
                ["k"],
                "v",
                inserts=mk(ins) if ins else None,
                deletes=mk(dels) if dels else None,
            ).localCheckpoint(eager=True)
            want = _rows(agg_view(mk(rows), ["k"], "v")) if rows else []
            assert _rows(view) == want, f"seed {seed} step {step}"
