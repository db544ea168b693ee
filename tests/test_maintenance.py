"""Unified index-maintenance scheduler (llm/maintenance.py): one call
runs exactly the compactions that are DUE per each structure's own
commit record, answers are unchanged, a converged pass is a no-op, and
a crash between two families' compactions is repaired by rerunning."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from chess_pos_db_spark.llm import dedup_index as DI
from chess_pos_db_spark.llm import maintenance as M
from chess_pos_db_spark.llm import search as S
from chess_pos_db_spark.llm import similarity as sim
from chess_pos_db_spark.tables import t


def _drop(spark, *prefixes):
    for name in list(spark.catalog.listTables()):
        if name.name.startswith(prefixes):
            spark.sql(f"DROP TABLE IF EXISTS {name.name}")


def _mk_ivf(spark, tmp_path, n_appends=4):
    dims = sim._DIMS
    rows = []
    for i in range(20):
        v = np.zeros(dims)
        v[i % 2] = 1.0
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids, cnorms = sim._ivf_centroids(spark, "", k=2, emb=emb)
    out = str(tmp_path / "mnt_ivf")
    base = emb.filter(F.col("vec_id") < 20 - 2 * n_appends)
    (
        base.join(sim._cell_assignments(base, centroids, cnorms), "vec_id")
        .write.mode("overwrite").partitionBy("cell").parquet(out)
    )
    for j in range(n_appends):
        lo = 20 - 2 * n_appends + 2 * j
        batch = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 2))
        sim.append_ivf_layout(batch, out, centroids, cnorms)
    return emb, centroids, cnorms, out


@pytest.mark.slow
def test_maintain_runs_exactly_the_due_compactions(spark, sf_dir, tmp_path):
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    try:
        # postings: 2 delta generations — due at max_generations=2
        S.build_inverted_index(spark, docs.filter(F.col("doc_id") % 3 == 0), "mnt_ix")
        S.append_to_index(spark, docs.filter(F.col("doc_id") % 3 == 1), "mnt_ix")
        S.append_to_index(spark, docs.filter(F.col("doc_id") % 3 == 2), "mnt_ix")
        want_search = [
            tuple(r) for r in S.search_indexed(spark, "mnt_ix", S._QUERY_TERMS).collect()
        ]

        # LSH: no appends, but a delete leaves masked members over the
        # fraction threshold — due through the masked leg
        DI.build_lsh_index(spark, docs, "mnt_lsh")
        doomed = docs.filter(F.col("doc_id") % 4 == 1).select("doc_id")
        DI.delete_from_lsh_index(spark, doomed, "mnt_lsh")
        probe = t(spark, sf_dir, "documents").filter(
            (F.col("doc_id") >= 600) & (F.col("doc_id") < 900)
        )
        want_probe = sorted(
            tuple(r) for r in DI.probe_lsh_index(spark, probe, "mnt_lsh").collect()
        )

        # IVF: appends accumulated small files in the two cells
        emb, centroids, cnorms, out = _mk_ivf(spark, tmp_path)
        counts = M.ivf_cell_file_counts(out)
        assert max(counts.values()) > 2
        want_ann = [
            tuple(r)
            for r in sim.ivf_query_layout(
                spark, out, centroids, cnorms,
                query_vec=emb.filter(F.col("vec_id") == 0).first().embedding,
            ).collect()
        ]

        rep = M.maintain_indexes(
            spark,
            postings_prefixes=["mnt_ix"],
            lsh_prefixes=["mnt_lsh"],
            ivf_layouts=[out],
            max_generations=2,
            max_masked_frac=0.1,
            max_files_per_cell=2,
        )
        assert rep["postings"]["mnt_ix"] == "compacted"
        assert rep["lsh"]["mnt_lsh"] == "compacted"
        assert rep["ivf"][out]["cells_compacted"] == 2
        assert rep["ivf"][out]["files_after"] < rep["ivf"][out]["files_before"]

        # state physically folded/purged, answers unchanged
        assert S._generations(spark, "mnt_ix") == [""]
        assert DI._generations(spark, "mnt_lsh") == [""]
        assert spark.table("mnt_lsh_members").join(
            doomed, "doc_id", "left_semi"
        ).count() == 0
        assert [
            tuple(r) for r in S.search_indexed(spark, "mnt_ix", S._QUERY_TERMS).collect()
        ] == want_search
        assert sorted(
            tuple(r) for r in DI.probe_lsh_index(spark, probe, "mnt_lsh").collect()
        ) == want_probe
        assert [
            tuple(r)
            for r in sim.ivf_query_layout(
                spark, out, centroids, cnorms,
                query_vec=emb.filter(F.col("vec_id") == 0).first().embedding,
            ).collect()
        ] == want_ann

        # converged: a second pass is a clean no-op everywhere
        before_files = {
            cd: sorted(os.listdir(cd)) for cd in glob.glob(f"{out}/cell=*")
        }
        rep2 = M.maintain_indexes(
            spark,
            postings_prefixes=["mnt_ix"],
            lsh_prefixes=["mnt_lsh"],
            ivf_layouts=[out],
            max_generations=2,
            max_masked_frac=0.1,
            max_files_per_cell=2,
        )
        assert rep2["postings"]["mnt_ix"] == "ok"
        assert rep2["lsh"]["mnt_lsh"] == "ok"
        assert rep2["ivf"][out]["cells_compacted"] == 0
        assert {
            cd: sorted(os.listdir(cd)) for cd in glob.glob(f"{out}/cell=*")
        } == before_files
    finally:
        _drop(spark, "mnt_ix", "mnt_lsh")


@pytest.mark.slow
def test_maintain_tombstone_pressure_alone_triggers_postings(spark, sf_dir):
    """Deletes without appends: tombstone generations over their own
    threshold make the postings index due even at zero delta gens —
    each pending generation costs every query an anti-join mask."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    try:
        S.build_inverted_index(spark, docs, "mnt_tomb")
        for mod in (5, 6):
            S.delete_from_index(
                spark,
                docs.filter(F.col("doc_id") % 17 == mod).select("doc_id"),
                "mnt_tomb",
            )
        m = S._read_meta(spark, "mnt_tomb")
        assert m["n_deltas"] == 0 and S._n_tomb_gens(m) == 2
        want = [
            tuple(r)
            for r in S.search_indexed(spark, "mnt_tomb", S._QUERY_TERMS).collect()
        ]
        rep = M.maintain_indexes(
            spark, postings_prefixes=["mnt_tomb"],
            max_generations=8, max_tombstone_generations=2,
        )
        assert rep["postings"]["mnt_tomb"] == "compacted"
        m2 = S._read_meta(spark, "mnt_tomb")
        assert S._n_tomb_gens(m2) == 0
        assert [
            tuple(r)
            for r in S.search_indexed(spark, "mnt_tomb", S._QUERY_TERMS).collect()
        ] == want
    finally:
        _drop(spark, "mnt_tomb")


@pytest.mark.slow
def test_maintain_crash_between_families_rerun_converges(
    spark, sf_dir, monkeypatch
):
    """No cross-structure transaction, by design: a crash AFTER the
    postings compaction but BEFORE the LSH one leaves the scheduler
    rerunnable — postings is no longer due (no-ops), LSH runs."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    try:
        S.build_inverted_index(spark, docs.filter(F.col("doc_id") % 2 == 0), "mntc_ix")
        S.append_to_index(spark, docs.filter(F.col("doc_id") % 2 == 1), "mntc_ix")
        DI.build_lsh_index(spark, docs.filter(F.col("doc_id") % 3 == 0), "mntc_lsh")
        DI.append_to_lsh_index(
            spark, docs.filter(F.col("doc_id") % 3 == 1), "mntc_lsh"
        )

        real = DI.compact_lsh_index

        def dying(*a, **kw):
            raise RuntimeError("simulated crash in the LSH compaction")

        monkeypatch.setattr(DI, "compact_lsh_index", dying)
        with pytest.raises(RuntimeError, match="simulated crash"):
            M.maintain_indexes(
                spark,
                postings_prefixes=["mntc_ix"],
                lsh_prefixes=["mntc_lsh"],
                max_generations=1,
            )
        monkeypatch.setattr(DI, "compact_lsh_index", real)

        # postings folded before the crash; LSH untouched
        assert S._generations(spark, "mntc_ix") == [""]
        assert DI._generations(spark, "mntc_lsh") == ["", "_d1"]

        rep = M.maintain_indexes(
            spark,
            postings_prefixes=["mntc_ix"],
            lsh_prefixes=["mntc_lsh"],
            max_generations=1,
        )
        assert rep["postings"]["mntc_ix"] == "ok"
        assert rep["lsh"]["mntc_lsh"] == "compacted"
        assert DI._generations(spark, "mntc_lsh") == [""]
    finally:
        _drop(spark, "mntc_ix", "mntc_lsh")


def test_ivf_compaction_touches_only_due_cells_and_reports_skew(
    spark, tmp_path
):
    """Cells under the file threshold keep their files byte-identical;
    the skew report flags a lopsided layout without acting on it."""
    dims = sim._DIMS
    rows = []
    # centroids seed from vec_ids 0 and 1, so they must differ; ids
    # {1, 16, 17} point along e1 (the quiet cell), the other 15 along
    # e0 (the crowded cell)
    for i in range(18):
        v = np.zeros(dims)
        v[1 if i in (1, 16, 17) else 0] = 1.0
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids, cnorms = sim._ivf_centroids(spark, "", k=2, emb=emb)
    out = str(tmp_path / "skew_ivf")
    base = emb.filter((F.col("vec_id") < 10) | (F.col("vec_id") >= 16))
    (
        base.join(sim._cell_assignments(base, centroids, cnorms), "vec_id")
        .write.mode("overwrite").partitionBy("cell").parquet(out)
    )
    # appends land only in the crowded cell → only it becomes due
    for j in range(3):
        batch = emb.filter(
            (F.col("vec_id") >= 10 + 2 * j) & (F.col("vec_id") < 12 + 2 * j)
        )
        sim.append_ivf_layout(batch, out, centroids, cnorms)
    counts = M.ivf_cell_file_counts(out)
    due = [c for c, n in counts.items() if n > 3]
    quiet = [c for c, n in counts.items() if n <= 3]
    assert due and quiet

    def state(cell):
        cd = os.path.join(out, f"cell={cell}")
        return sorted(
            (f, os.path.getmtime(os.path.join(cd, f)))
            for f in os.listdir(cd) if f.endswith(".parquet")
        )

    quiet_before = {c: state(c) for c in quiet}
    res = M.compact_ivf_cells(spark, out, max_files_per_cell=3)
    assert res["cells_compacted"] == len(due)
    for c in quiet:
        assert state(c) == quiet_before[c], f"quiet cell {c} rewritten"
    # layout content unchanged by compaction
    got = sorted(r["vec_id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(18))
    skew = M.ivf_cell_skew(out)
    assert skew > 1.5
    rep = M.maintain_indexes(
        spark, ivf_layouts=[out], max_files_per_cell=3,
        recluster_skew_factor=1.5,
    )
    assert rep["ivf"][out]["recluster_recommended"] is True


def test_maintain_indexes_idle_ivf_runs_zero_spark_jobs(spark, tmp_path):
    """The scheduler's own contract: when nothing is due, the IVF leg
    is pure filesystem metadata (directory walk + parquet footers for
    the skew report) — ZERO Spark jobs. Pinned via a job group: any
    job submitted by the idle invocation would land in it."""
    import os

    from chess_pos_db_spark.llm import maintenance as M

    out = str(tmp_path / "idle_ivf")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(20)], "vec_id long, cell int"
    )
    df.repartition(1).write.mode("overwrite").partitionBy("cell").parquet(out)
    counts = M.ivf_cell_file_counts(out)
    assert all(n <= 8 for n in counts.values())  # nothing due

    sc = spark.sparkContext
    sc.setJobGroup("idle-maintain-probe", "zero-job contract")
    try:
        rep = M.maintain_indexes(spark, ivf_layouts=[out])
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("idle-maintain-probe")
        sc.setJobGroup("", "")
    assert rep["ivf"][out]["cells_compacted"] == 0
    assert rep["ivf"][out]["skew"] >= 1.0
    assert list(jobs) == [], f"idle IVF maintenance ran Spark jobs: {jobs}"


def test_ivf_maintenance_rejects_unwalkable_layouts(spark, tmp_path):
    """ADVICE fix: a layout URI the filesystem walk cannot see (remote
    scheme) or a dir with no cell=* children must FAIL the due-check
    loudly instead of silently reporting a clean no-op."""
    import pytest as _pytest

    from chess_pos_db_spark.llm import maintenance as M

    with _pytest.raises(ValueError, match="local"):
        M.ivf_cell_file_counts("hdfs://nn/warehouse/ivf_layout")
    empty = str(tmp_path / "not_a_layout")
    __import__("os").makedirs(empty)
    with _pytest.raises(ValueError, match="cell="):
        M.ivf_cell_file_counts(empty)
    with _pytest.raises(ValueError, match="cell="):
        M.maintain_indexes(spark, ivf_layouts=[empty])


def test_maintain_stores_compacts_and_vacuums_on_pressure(spark, tmp_path):
    """The versioned store gets the same scheduled health as the index
    families: live-version pressure triggers the store's own
    aggregate-combining compaction, vacuum reclaims the superseded
    files, a rerun is a no-op, and the store's answers never change."""
    from chess_pos_db_spark.llm import maintenance as M
    from chess_pos_db_spark.plans import layout

    path = str(tmp_path / "pressure_store")
    mk = lambda rows: spark.createDataFrame(rows, "k long, cnt long")
    for i in range(6):
        layout.append_versioned(mk([(j, 1) for j in range(4)]), path, ["k"])
    before = sorted(
        tuple(r)
        for r in layout.read_snapshot(spark, path)
        .groupBy("k").agg(F.sum("cnt").alias("c"))
        .collect()
    )

    rep = M.maintain_stores(
        spark, {path: {"cnt": "sum"}}, max_live_versions=4
    )
    r = rep[path]
    assert r["live_versions_before"] == 6
    assert r["compacted"] is True
    assert r["vacuumed_files"] > 0 and r["vacuum_blocked"] is None
    assert M.store_version_pressure(path)["live_versions"] == 1
    after = sorted(
        tuple(r) for r in layout.read_snapshot(spark, path).collect()
    )
    assert after == [(j, 6) for j in range(4)]
    assert before == [(j, 6) for j in range(4)]

    # converged: rerun is a clean no-op
    rep2 = M.maintain_stores(spark, {path: {"cnt": "sum"}}, max_live_versions=4)
    assert rep2[path]["compacted"] is False
    assert rep2[path]["vacuumed_files"] == 0


def test_maintain_stores_row_store_and_export_guard(spark, tmp_path):
    """A row store (agg_spec None) is never auto-compacted — an
    agg_spec would silently drop unlisted payload columns — and a
    vacuum that would strand a lagging CDC export is REPORTED as
    blocked, not forced; catching the export up unblocks it."""
    from chess_pos_db_spark.llm import maintenance as M
    from chess_pos_db_spark.plans import layout

    path = str(tmp_path / "row_store")
    out = str(tmp_path / "row_out")
    mk = lambda rows: spark.createDataFrame(rows, "k long, val string")
    layout.append_versioned(mk([(1, "a")]), path, ["k"])
    assert layout.export_changes(spark, path, out, ["k"]) == [1]
    layout.append_versioned(mk([(2, "b")]), path, ["k"])
    layout.delete_rows(spark, path, "k = 1")

    rep = M.maintain_stores(spark, {path: None}, max_live_versions=1)
    r = rep[path]
    assert r["compacted"] is False  # no spec, no compaction
    assert r["vacuumed_files"] == 0
    assert "strand CDC export" in r["vacuum_blocked"]
    # the store is untouched: export can still catch up and replay
    assert layout.export_changes(spark, path, out, ["k"]) == [2, 3]

    rep2 = M.maintain_stores(spark, {path: None})
    assert rep2[path]["vacuum_blocked"] is None
    assert rep2[path]["vacuumed_files"] > 0
    got = sorted(tuple(r) for r in layout.read_snapshot(spark, path).collect())
    assert got == [(2, "b")]


def test_maintain_stores_idle_runs_zero_spark_jobs(spark, tmp_path):
    """All-ok store maintenance is one manifest read + a no-op vacuum —
    zero Spark jobs, same contract as the idle IVF leg."""
    from chess_pos_db_spark.llm import maintenance as M
    from chess_pos_db_spark.plans import layout

    path = str(tmp_path / "idle_store")
    layout.append_versioned(
        spark.createDataFrame([(1, 2)], "k long, cnt long"), path, ["k"]
    )
    sc = spark.sparkContext
    sc.setJobGroup("idle-store-probe", "zero-job contract")
    try:
        rep = M.maintain_stores(spark, {path: {"cnt": "sum"}})
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("idle-store-probe")
        sc.setJobGroup("", "")
    assert rep[path]["compacted"] is False
    assert list(jobs) == [], f"idle store maintenance ran Spark jobs: {jobs}"


def test_maintain_stores_retention_window(spark, tmp_path):
    """keep_history_versions=N vacuums to latest-N instead of latest —
    a rolling audit window for stores whose untagged time travel
    matters. The trade is documented: right after a compaction the
    window pins every pre-compaction file a latest-N read could need,
    so nothing is reclaimable until N more versions land."""
    from chess_pos_db_spark.llm import maintenance as M
    from chess_pos_db_spark.plans import layout

    path = str(tmp_path / "retained_store")
    mk = lambda rows: spark.createDataFrame(rows, "k long, cnt long")
    for i in range(5):
        layout.append_versioned(mk([(i, 1)]), path, ["k"])
    layout.compact_versioned(spark, path, key=["k"], agg_spec={"cnt": "sum"})

    rep = M.maintain_stores(
        spark, {path: None}, keep_history_versions=2
    )
    assert rep[path]["vacuum_blocked"] is None
    m = layout.read_manifest(path)
    # floor is latest-2 = 4: v4 and v5 stay time-travelable...
    assert m["min_time_travel"] == 4
    assert layout.read_snapshot(spark, path, 4).count() == 4
    with pytest.raises(ValueError, match="expired"):
        layout.read_snapshot(spark, path, 3)
    # ...and because v4/v5 liveness spans ALL the append files, the
    # window reclaimed nothing yet — that's the documented trade
    assert rep[path]["vacuumed_files"] == 0

    # the default (0) vacuums to latest and reclaims the appends
    rep2 = M.maintain_stores(spark, {path: None})
    assert rep2[path]["vacuumed_files"] > 0
    assert layout.read_snapshot(spark, path).count() == 5


@pytest.mark.slow
def test_maintenance_crash_injection_randomized_converges(
    spark, tmp_path, monkeypatch
):
    """Round-12 brief item #4: the scheduler's crash contract under a
    RANDOMIZED adversary, not just the single-point deterministic pins
    above. Per seed: build pressure on all four structures (postings
    deltas+tombstones, LSH delta+masked deletes, IVF small files,
    store live-version pressure), inject a kill at a random scheduler
    leg (postings/LSH/IVF/store-compact/store-vacuum, before OR after
    the leg's real action commits), rerun the schedulers to converge,
    and require (a) every structure answers exactly as a FRESH BUILD
    over the live content, (b) a further pass is a full no-op — the
    "due-ness derives from live state, reruns repair any prefix"
    contract (module docstring), across kill points no hand-written
    scenario enumerates."""
    import random

    from chess_pos_db_spark.plans import layout

    vocab = [f"w{i}" for i in range(20)]

    def mk_docs(ids):
        rows = []
        for i in ids:
            r = random.Random(91_000 + i)
            rows.append((i, " ".join(r.choice(vocab) for _ in range(10))))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def mk_ids(ids):
        return spark.createDataFrame([(d,) for d in ids], "doc_id long")

    terms = ["w1", "w5", "w13"]
    dims = sim._DIMS

    for seed in range(3):
        rng = random.Random(300 + seed)
        px, lx = f"cr_ix_{seed}", f"cr_lsh_{seed}"
        ivf_dir = str(tmp_path / f"cr_ivf_{seed}")
        store = str(tmp_path / f"cr_store_{seed}")
        try:
            # --- postings: 2 delta gens + 1 tombstone gen (due) ---
            live_docs = set(range(0, 10))
            S.build_inverted_index(spark, mk_docs(sorted(live_docs)), px)
            S.append_to_index(spark, mk_docs(range(10, 16)), px)
            live_docs |= set(range(10, 16))
            S.append_to_index(spark, mk_docs(range(16, 20)), px)
            live_docs |= set(range(16, 20))
            doomed = rng.sample(sorted(live_docs), 3)
            S.delete_from_index(spark, mk_ids(doomed), px)
            live_docs -= set(doomed)

            # --- LSH: 1 delta gen + masked deletes over 5% (due) ---
            live_lsh = set(range(0, 12))
            DI.build_lsh_index(spark, mk_docs(sorted(live_lsh)), lx)
            DI.append_to_lsh_index(spark, mk_docs(range(12, 18)), lx)
            live_lsh |= set(range(12, 18))
            dl = rng.sample(sorted(live_lsh), 3)
            DI.delete_from_lsh_index(spark, mk_ids(dl), lx)
            live_lsh -= set(dl)

            # --- IVF: appends pile small files per cell (due); one
            # random delete keeps the frozen-quantizer path honest ---
            rows = []
            for i in range(20):
                v = np.zeros(dims)
                v[i % 2] = 1.0
                v[2 + (i % 5)] = 0.25 + 0.01 * i
                rows.append((i, [float(x) for x in v]))
            emb = spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            )
            centroids, cnorms = sim._ivf_centroids(spark, "", k=2, emb=emb)
            live_vec = set(range(0, 12))
            base = emb.filter(F.col("vec_id") < 12)
            (
                base.join(
                    sim._cell_assignments(base, centroids, cnorms), "vec_id"
                )
                .write.mode("overwrite").partitionBy("cell").parquet(ivf_dir)
            )
            for lo in (12, 14, 16, 18):
                batch = emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 2)
                )
                sim.append_ivf_layout(batch, ivf_dir, centroids, cnorms)
                live_vec |= {lo, lo + 1}
            vd = rng.sample(sorted(live_vec), 2)
            sim.delete_from_ivf_layout(
                spark, emb.filter(F.col("vec_id").isin(vd)),
                ivf_dir, centroids, cnorms,
            )
            live_vec -= set(vd)

            # --- store: 4 live versions (due at max_live_versions=2) ---
            model: dict[int, int] = {}
            mk_store = lambda rows: spark.createDataFrame(
                rows, "k long, val long"
            )
            for j in range(4):
                batch = {10 * j + i: 100 * j + i for i in range(3)}
                model.update(batch)
                layout.append_versioned(
                    mk_store(sorted(batch.items())), store, ["k"]
                )

            # --- changelog: 4 exported version dirs (compaction due
            # at compact_changelog_over=2) on a second store ---
            clc = str(tmp_path / f"cr_clc_{seed}")
            clc_log = str(tmp_path / f"cr_clc_log_{seed}")
            clc_model: dict[int, int] = {}
            for j in range(4):
                batch = {10 * j + i: 500 * j + i for i in range(2)}
                clc_model.update(batch)
                layout.append_versioned(
                    mk_store(sorted(batch.items())), clc, ["k"]
                )
            layout.export_changes(spark, clc, clc_log, ["k"])

            def run_all():
                rep_i = M.maintain_indexes(
                    spark,
                    postings_prefixes=[px],
                    lsh_prefixes=[lx],
                    ivf_layouts=[ivf_dir],
                    max_generations=2,
                    max_masked_frac=0.05,
                    max_files_per_cell=2,
                )
                rep_s = M.maintain_stores(
                    spark, {store: {"val": "max"}}, max_live_versions=2
                )
                rep_c = M.maintain_stores(
                    spark, {clc: None}, vacuum=False,
                    compact_changelog_over=2,
                )
                return rep_i, rep_s, rep_c

            # --- inject ONE kill at a random leg, before/after its
            # real action commits ---
            targets = {
                "postings": (S, "compact_index"),
                "lsh": (DI, "compact_lsh_index"),
                "ivf": (M, "compact_ivf_cells"),
                "store_compact": (layout, "compact_versioned"),
                "store_vacuum": (layout, "expire_snapshots"),
                "changelog_compact": (layout, "compact_changelog"),
            }
            leg = rng.choice(sorted(targets))
            mode = rng.choice(["before", "after"])
            mod, fname = targets[leg]
            real = getattr(mod, fname)

            def boom(*a, __real=real, __mode=mode, **k):
                if __mode == "after":
                    __real(*a, **k)
                raise RuntimeError("injected crash")

            monkeypatch.setattr(mod, fname, boom)
            with pytest.raises(RuntimeError, match="injected crash"):
                run_all()
            monkeypatch.undo()

            # --- rerun-to-converge; a further pass is a full no-op ---
            run_all()
            rep_i3, rep_s3, rep_c3 = run_all()
            assert rep_i3["postings"][px] == "ok", (seed, leg, mode)
            assert rep_i3["lsh"][lx] == "ok", (seed, leg, mode)
            assert rep_i3["ivf"][ivf_dir]["cells_compacted"] == 0
            assert rep_s3[store]["compacted"] is False
            assert rep_s3[store]["vacuumed_files"] == 0
            assert rep_s3[store]["vacuum_blocked"] is None
            assert rep_c3[clc]["changelogs_compacted"] == {}, (seed, leg, mode)

            # --- every structure ≡ a fresh build over live content ---
            got_search = sorted(
                tuple(r)
                for r in S.search_indexed(spark, px, terms, k=15).collect()
            )
            S.build_inverted_index(
                spark, mk_docs(sorted(live_docs)), f"cr_fresh_ix_{seed}"
            )
            want_search = sorted(
                tuple(r)
                for r in S.search_indexed(
                    spark, f"cr_fresh_ix_{seed}", terms, k=15
                ).collect()
            )
            assert got_search == want_search, (seed, leg, mode)
            assert want_search

            probes = mk_docs(range(5000, 5008))
            got_probe = sorted(
                tuple(r)
                for r in DI.probe_lsh_index(spark, probes, lx).collect()
            )
            DI.build_lsh_index(
                spark, mk_docs(sorted(live_lsh)), f"cr_fresh_lsh_{seed}"
            )
            want_probe = sorted(
                tuple(r)
                for r in DI.probe_lsh_index(
                    spark, probes, f"cr_fresh_lsh_{seed}"
                ).collect()
            )
            assert got_probe == want_probe, (seed, leg, mode)

            qv = emb.filter(
                F.col("vec_id") == sorted(live_vec)[0]
            ).first().embedding
            got_ann = [
                tuple(r)
                for r in sim.ivf_query_layout(
                    spark, ivf_dir, centroids, cnorms, query_vec=qv
                ).collect()
            ]
            fresh_ivf = str(tmp_path / f"cr_fresh_ivf_{seed}")
            live_emb = emb.filter(
                F.col("vec_id").isin(sorted(live_vec))
            )
            (
                live_emb.join(
                    sim._cell_assignments(live_emb, centroids, cnorms),
                    "vec_id",
                )
                .write.mode("overwrite").partitionBy("cell")
                .parquet(fresh_ivf)
            )
            want_ann = [
                tuple(r)
                for r in sim.ivf_query_layout(
                    spark, fresh_ivf, centroids, cnorms, query_vec=qv
                ).collect()
            ]
            assert got_ann == want_ann, (seed, leg, mode)
            assert want_ann

            got_store = {
                r["k"]: r["val"]
                for r in layout.read_snapshot(spark, store).collect()
            }
            assert got_store == model, (seed, leg, mode)

            # the compacted changelog still replays to the live state
            got_clc = {
                r["k"]: r["val"]
                for r in layout.replay_changelog(
                    spark, clc_log, ["k"]
                ).collect()
            }
            assert got_clc == clc_model, (seed, leg, mode)
        finally:
            _drop(spark, f"cr_ix_{seed}", f"cr_lsh_{seed}",
                  f"cr_fresh_ix_{seed}", f"cr_fresh_lsh_{seed}")


def test_maintain_stores_compacts_changelogs(spark, tmp_path):
    """The scheduler's changelog-compaction leg (opt-in): an export
    whose changes/ dir holds more version dirs than the threshold is
    folded into a rebase base; a converged pass no-ops; an export whose
    cursor trails a schema break is SKIPPED with a report entry (the
    pre-break era's fold key is not the current sort_key)."""
    from chess_pos_db_spark.plans import layout

    path = str(tmp_path / "clc_store")
    out = str(tmp_path / "clc_log")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    layout.append_versioned(mk([(1, "a")]), path, ["k"])
    for i in range(2, 5):
        layout.append_versioned(mk([(i, f"v{i}")]), path, ["k"])
    layout.export_changes(spark, path, out, ["k"])

    rep = M.maintain_stores(
        spark, {path: None}, vacuum=False, compact_changelog_over=2
    )
    import os

    assert rep[path]["changelogs_compacted"] == {os.path.abspath(out): 4}
    want = sorted(tuple(r) for r in layout.read_snapshot(spark, path).collect())
    assert sorted(
        tuple(r) for r in layout.replay_changelog(spark, out, ["k"]).collect()
    ) == want
    # converged: one base dir remains, under threshold -> no-op
    rep2 = M.maintain_stores(
        spark, {path: None}, vacuum=False, compact_changelog_over=2
    )
    assert rep2[path]["changelogs_compacted"] == {}

    # a pending (unexported) schema break blocks compaction loudly
    layout.evolve_schema(spark, path, renames={"v": "w"})
    for i in range(20, 23):
        layout.append_versioned(
            spark.createDataFrame([(i, f"w{i}")], "k long, w string"),
            path, ["k"],
        )
    rep3 = M.maintain_stores(
        spark, {path: None}, vacuum=False, compact_changelog_over=0
    )
    assert rep3[path]["changelogs_compacted"] == {
        os.path.abspath(out): "skipped_rebase_pending"
    }
    # export the break, then compaction proceeds under the marker's key
    layout.export_changes(spark, path, out, ["k"])
    rep4 = M.maintain_stores(
        spark, {path: None}, vacuum=False, compact_changelog_over=2
    )
    assert rep4[path]["changelogs_compacted"] == {os.path.abspath(out): 8}
    rep_df = layout.replay_changelog(spark, out, ["k"])
    assert rep_df.columns == ["k", "w"]
    assert sorted(tuple(r) for r in rep_df.collect()) == sorted(
        tuple(r) for r in layout.read_snapshot(spark, path).collect()
    )
