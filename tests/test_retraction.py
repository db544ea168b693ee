"""Cross-structure retraction: one feed of doc_ids propagates through
the snapshot store, the postings index, and the LSH index — after the
job, EVERY structure answers exactly as if built fresh over the live
corpus, and a re-run after a mid-propagation crash converges instead of
failing or double-deleting."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chess_pos_db_spark.llm import dedup_index as DI
from chess_pos_db_spark.llm import retraction, search as S
from chess_pos_db_spark.plans import layout
from chess_pos_db_spark.tables import t


def _mk_structures(spark, docs, tag, tmp_path):
    store = str(tmp_path / f"store_{tag}")
    layout.append_versioned(
        docs.select("doc_id", "source", "text"), store, ["doc_id"]
    )
    S.build_inverted_index(spark, docs, f"retr_{tag}_ix")
    DI.build_lsh_index(spark, docs, f"retr_{tag}_lsh")
    return store, f"retr_{tag}_ix", f"retr_{tag}_lsh"


def _drop(spark, *prefixes):
    for name in list(spark.catalog.listTables()):
        if name.name.startswith(prefixes):
            spark.sql(f"DROP TABLE IF EXISTS {name.name}")


@pytest.mark.slow
def test_retraction_converges_every_structure(spark, sf_dir, tmp_path):
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
    doomed = docs.filter(F.col("doc_id") % 13 == 5).select("doc_id")
    live = docs.filter(F.col("doc_id") % 13 != 5)
    try:
        store, ix, lsh = _mk_structures(spark, docs, "full", tmp_path)
        res = retraction.retract_documents(
            spark, doomed, store_path=store,
            postings_prefix=ix, lsh_prefix=lsh,
        )
        n = doomed.count()
        assert res == {
            "requested": n, "store": n, "postings": n, "lsh": n,
        }

        # store answers the live corpus
        got_ids = sorted(
            r["doc_id"]
            for r in layout.read_snapshot(spark, store).select("doc_id").collect()
        )
        assert got_ids == sorted(r["doc_id"] for r in live.select("doc_id").collect())

        # search answers as a fresh build over live
        S.build_inverted_index(spark, live, "retr_ref_ix")
        assert [
            tuple(r) for r in S.search_indexed(spark, ix, S._QUERY_TERMS).collect()
        ] == [
            tuple(r)
            for r in S.search_indexed(spark, "retr_ref_ix", S._QUERY_TERMS).collect()
        ]

        # LSH probes answer as a fresh build over live
        DI.build_lsh_index(spark, live, "retr_ref_lsh")
        probe = t(spark, sf_dir, "documents").filter(
            (F.col("doc_id") >= 800) & (F.col("doc_id") < 1200)
        )
        want = sorted(
            tuple(r) for r in DI.probe_lsh_index(spark, probe, "retr_ref_lsh").collect()
        )
        assert sorted(
            tuple(r) for r in DI.probe_lsh_index(spark, probe, lsh).collect()
        ) == want

        # a second identical run is a clean no-op (idempotent)
        res2 = retraction.retract_documents(
            spark, doomed, store_path=store,
            postings_prefix=ix, lsh_prefix=lsh,
        )
        assert res2 == {"requested": n, "store": 0, "postings": 0, "lsh": 0}
    finally:
        _drop(spark, "retr_full", "retr_ref")


@pytest.mark.slow
def test_retraction_rerun_after_partial_failure_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash mid-propagation (the LSH delete dies after store+postings
    committed): the RE-RUN completes the remaining structure and
    no-ops the finished ones."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    doomed = docs.filter(F.col("doc_id") % 11 == 3).select("doc_id")
    n = doomed.count()
    try:
        store, ix, lsh = _mk_structures(spark, docs, "crash", tmp_path)

        real = DI.delete_from_lsh_index

        def dying(*a, **kw):
            raise RuntimeError("simulated crash in the LSH delete")

        monkeypatch.setattr(DI, "delete_from_lsh_index", dying)
        with pytest.raises(RuntimeError, match="simulated crash"):
            retraction.retract_documents(
                spark, doomed, store_path=store,
                postings_prefix=ix, lsh_prefix=lsh,
            )
        monkeypatch.setattr(DI, "delete_from_lsh_index", real)

        # store and postings committed; LSH still holds the ids
        res = retraction.retract_documents(
            spark, doomed, store_path=store,
            postings_prefix=ix, lsh_prefix=lsh,
        )
        assert res == {"requested": n, "store": 0, "postings": 0, "lsh": n}

        # every structure converged to the live corpus
        live = docs.filter(F.col("doc_id") % 11 != 3)
        assert layout.read_snapshot(spark, store).join(
            doomed, "doc_id", "left_semi"
        ).count() == 0
        assert DI.kept_doc_ids(spark, lsh).join(
            doomed, "doc_id", "left_semi"
        ).count() == 0
        S.build_inverted_index(spark, live, "retr_crash_ref")
        assert [
            tuple(r) for r in S.search_indexed(spark, ix, S._QUERY_TERMS).collect()
        ] == [
            tuple(r)
            for r in S.search_indexed(
                spark, "retr_crash_ref", S._QUERY_TERMS
            ).collect()
        ]
    finally:
        _drop(spark, "retr_crash")


def test_empty_retraction_feed_is_a_clean_noop(spark, tmp_path):
    """An empty feed must not write tombstone generations, swap tables,
    or bump any commit record — the direct-delete no-op halves of the
    orchestrator's liveness filtering."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}", "en", "s", 10) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    empty = docs.filter(F.col("doc_id") < 0).select("doc_id")
    try:
        S.build_inverted_index(spark, docs, "retr_empty_ix")
        assert S.delete_from_index(spark, empty, "retr_empty_ix") == 0
        m = S._read_meta(spark, "retr_empty_ix")
        assert S._n_tomb_gens(m) == 0 and m["n_docs"] == 4

        DI.build_lsh_index(spark, docs, "retr_empty_lsh")
        assert DI.delete_from_lsh_index(spark, empty, "retr_empty_lsh") == 0
        assert DI._read_meta(spark, "retr_empty_lsh")["n_docs"] == 4

        res = retraction.retract_documents(
            spark, empty,
            postings_prefix="retr_empty_ix", lsh_prefix="retr_empty_lsh",
        )
        assert res == {"requested": 0, "postings": 0, "lsh": 0}
    finally:
        _drop(spark, "retr_empty")


def test_spec_exclude_ids_stage(spark, tmp_path):
    """The lazy retraction half: the spec runner's exclude_ids stage
    drops denylisted docs inline (list form and parquet form), rejects
    ambiguous double-source configs, and requires a source."""
    from chess_pos_db_spark.llm.spec import run_pipeline

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 10) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = run_pipeline(
        docs, {"stages": [{"op": "exclude_ids", "doc_ids": [2, 5]}]}
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 3, 4, 6, 7, 8, 9]

    deny = str(tmp_path / "denylist")
    spark.createDataFrame([(3,), (7,)], "doc_id long").write.parquet(deny)
    out = run_pipeline(
        docs, {"stages": [{"op": "exclude_ids", "path": deny}]}
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 2, 4, 5, 6, 8, 9]

    with pytest.raises(ValueError, match="not both"):
        run_pipeline(
            docs,
            {"stages": [{"op": "exclude_ids", "doc_ids": [1], "path": deny}]},
        ).collect()
    with pytest.raises(ValueError):
        run_pipeline(docs, {"stages": [{"op": "exclude_ids"}]})


def test_retraction_propagates_to_materialized_views(
    spark, sf_dir, tmp_path, monkeypatch
):
    """One feed forgets everywhere INCLUDING materialized aggregates:
    views pinned to the store's version ledger catch up through the
    store's own CDC in the same retraction call; a re-run is a no-op;
    a crash between the store delete and the view advance is repaired
    by the re-run (the version pin, not the feed, drives the view
    leg)."""
    from chess_pos_db_spark.plans import mv

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    doomed = docs.filter(F.col("doc_id") % 9 == 4).select("doc_id")
    n = doomed.count()
    store = str(tmp_path / "store_views")
    layout.append_versioned(
        docs.select("doc_id", "source", "lang", "n_chars"), store, ["doc_id"]
    )
    dims, ms = ["source"], [("count", "*"), ("sum", "n_chars")]
    vp = str(tmp_path / "view_views")
    mv.write_view(
        mv.build_view(layout.read_snapshot(spark, store), dims, ms),
        vp, dims, ms, base_version=1,
    )

    # crash AFTER the store delete commits, BEFORE the view advances
    real = mv.advance_view

    def dying(*a, **kw):
        raise RuntimeError("simulated crash before the view leg")

    monkeypatch.setattr(mv, "advance_view", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        retraction.retract_documents(
            spark, doomed, store_path=store, view_paths=[vp]
        )
    monkeypatch.setattr(mv, "advance_view", real)
    # the view still reflects v1 (crash left it behind the store)
    assert mv.read_view(spark, vp)[0].count() > 0
    with pytest.raises(mv.StaleViewError):
        mv.read_view(spark, vp, expect_base_version=2)

    # the RE-RUN repairs the view leg even though the store leg no-ops
    res = retraction.retract_documents(
        spark, doomed, store_path=store, view_paths=[vp]
    )
    assert res == {"requested": n, "store": 0, "views": {vp: 2}}
    got, _, _ = mv.read_view(spark, vp, expect_base_version=2)
    want = mv.build_view(layout.read_snapshot(spark, store), dims, ms)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )

    # idempotent: the identical run no-ops everywhere
    res2 = retraction.retract_documents(
        spark, doomed, store_path=store, view_paths=[vp]
    )
    assert res2 == {"requested": n, "store": 0, "views": {vp: 2}}

    # views without a store are a caller bug, loudly
    with pytest.raises(ValueError, match="require store_path"):
        retraction.retract_documents(spark, doomed, view_paths=[vp])


def test_spec_degenerate_values_fail_at_bind_time(spark):
    """Config values that bind cleanly but silently produce an empty
    (or unfiltered) corpus must raise at bind time: an empty
    lang_filter, a permille of 0 / >1000 (rate-unit typo), a
    per_source of 0. An empty exclude_ids DENYLIST stays legal —
    excluding nothing is the correct reading of an empty retraction
    list."""
    from chess_pos_db_spark.llm.spec import run_pipeline

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 10) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for bad in (
        {"op": "lang_filter", "langs": []},
        {"op": "sample_hash", "permille": 0},
        {"op": "sample_hash", "permille": 1001},
        {"op": "sample_hash", "permille": -5},
        {"op": "domain_cap", "per_source": 0},
    ):
        with pytest.raises(ValueError):
            run_pipeline(docs, {"stages": [bad]})
    # boundary values stay legal
    out = run_pipeline(
        docs,
        {"stages": [
            {"op": "sample_hash", "permille": 1000},
            {"op": "domain_cap", "per_source": 1},
            {"op": "exclude_ids", "doc_ids": []},
        ]},
    )
    assert out.count() == 1  # one source, capped at 1


@pytest.mark.slow
def test_retraction_composite_randomized_against_model(spark, tmp_path):
    """Round-11 model-based differential test of the MULTI-STRUCTURE
    composite: seeded random interleavings of ingest / retract /
    maintain across all five structures a curation pipeline keeps —
    snapshot store, positional postings index, LSH near-dup index, IVF
    vector layout (vec_id == doc_id, the pipeline convention), and a
    count/sum materialized view — checked against a plain dict model
    of live docs after EVERY step, with an end-of-run full differential
    against fresh builds over the live corpus. The scenario tests pin
    each seam once; this interleaves them in orders no scenario
    enumerates (a retract between two ingests, maintenance compacting
    tombstones mid-history, a vacuum after a retract...)."""
    import random

    import numpy as np

    from chess_pos_db_spark.llm import maintenance as M
    from chess_pos_db_spark.llm import similarity as SIM
    from chess_pos_db_spark.plans import mv

    WORDS = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
        "golf", "hotel", "india", "juliet", "kilo", "lima",
    ]

    def text_for(k):
        return " ".join(WORDS[(k * 7 + i) % len(WORDS)] for i in range(10))

    def source_for(k):
        return f"s{k % 3}"

    def emb_for(k):
        c = k % 4
        return [
            1.0 if i == c else 0.01 * ((k + i) % 5) for i in range(4)
        ]

    def docs_df(ks):
        return spark.createDataFrame(
            [(k, source_for(k), text_for(k)) for k in ks],
            "doc_id long, source string, text string",
        )

    def embs_df(ks):
        return spark.createDataFrame(
            [(k, emb_for(k)) for k in ks],
            "vec_id long, embedding array<double>",
        )

    centroids = np.eye(4)
    cnorms = np.ones(4)
    dims, measures = ["source"], [("count", "*"), ("sum", "doc_id")]

    def model_view(model):
        agg: dict[str, tuple[int, int]] = {}
        for k in model:
            s = source_for(k)
            c, t_ = agg.get(s, (0, 0))
            agg[s] = (c + 1, t_ + k)
        return agg

    for seed in range(2):
        rng = random.Random(seed)
        tag = f"cmpr{seed}"
        store = str(tmp_path / f"cmp_store_{seed}")
        ivf_dir = str(tmp_path / f"cmp_ivf_{seed}")
        view = str(tmp_path / f"cmp_view_{seed}")
        ix, lsh = f"{tag}_ix", f"{tag}_lsh"
        try:
            first = list(range(20))
            model = {k: text_for(k) for k in first}
            layout.append_versioned(docs_df(first), store, ["doc_id"])
            S.build_inverted_index(spark, docs_df(first), ix)
            DI.build_lsh_index(spark, docs_df(first), lsh)
            (
                embs_df(first)
                .join(
                    SIM._cell_assignments(embs_df(first), centroids, cnorms),
                    "vec_id",
                )
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(ivf_dir)
            )
            mv.write_view(
                mv.build_view(docs_df(first), dims, measures),
                view, dims, measures, base_version=1,
            )
            next_id = [20]

            def check(step, op):
                live = layout.read_snapshot(spark, store)
                got = {r["doc_id"]: r["text"] for r in live.collect()}
                assert got == model, f"seed {seed} step {step} {op}: store"
                want_ids = set(model)

                pl = S._existing_doc_ids(spark, ix)
                tombs = S._tombstone_ids(spark, ix, S._read_meta(spark, ix))
                if tombs is not None:
                    pl = pl.join(tombs, "doc_id", "left_anti")
                assert {
                    r["doc_id"] for r in pl.collect()
                } == want_ids, f"seed {seed} step {step} {op}: postings"

                assert {
                    r["doc_id"]
                    for r in DI.kept_doc_ids(spark, lsh).collect()
                } == want_ids, f"seed {seed} step {step} {op}: lsh"

                import os

                has_parquet = any(
                    f.endswith(".parquet")
                    for _, _, fs in os.walk(ivf_dir)
                    for f in fs
                )
                ivf_ids = (
                    {
                        r["vec_id"]
                        for r in spark.read.parquet(ivf_dir)
                        .select("vec_id")
                        .collect()
                    }
                    if has_parquet
                    else set()
                )
                assert ivf_ids == want_ids, (
                    f"seed {seed} step {step} {op}: ivf"
                )

                mv.advance_view(spark, store, view)
                vdf, _, _ = mv.read_view(spark, view)
                got_view = {
                    r["source"]: (r["m_count_star"], r["m_sum_doc_id"])
                    for r in vdf.collect()
                    if r["m_count_star"] > 0
                }
                assert got_view == model_view(model), (
                    f"seed {seed} step {step} {op}: view"
                )

            check("init", "build")
            for step in range(5):
                op = rng.choice(["ingest", "retract", "maintain"])
                if op == "ingest":
                    batch = list(range(next_id[0], next_id[0] + 5))
                    next_id[0] += 5
                    layout.append_versioned(docs_df(batch), store, ["doc_id"])
                    S.append_to_index(spark, docs_df(batch), ix)
                    DI.append_to_lsh_index(spark, docs_df(batch), lsh)
                    SIM.append_ivf_layout(
                        embs_df(batch), ivf_dir, centroids, cnorms
                    )
                    model.update({k: text_for(k) for k in batch})
                elif op == "retract":
                    doomed = rng.sample(
                        sorted(model), min(3, len(model))
                    )
                    res = retraction.retract_documents(
                        spark,
                        spark.createDataFrame(
                            [(k,) for k in doomed], "doc_id long"
                        ),
                        store_path=store,
                        postings_prefix=ix,
                        lsh_prefix=lsh,
                        view_paths=[view],
                        ivf_layout=(ivf_dir, centroids, cnorms),
                    )
                    n = len(doomed)
                    assert (
                        res["store"], res["postings"],
                        res["lsh"], res["ivf"],
                    ) == (n, n, n, n)
                    for k in doomed:
                        model.pop(k)
                else:
                    M.maintain_indexes(
                        spark,
                        postings_prefixes=[ix],
                        lsh_prefixes=[lsh],
                        ivf_layouts=[ivf_dir],
                        max_generations=2,
                        max_tombstone_generations=1,
                        max_masked_frac=0.1,
                        max_files_per_cell=2,
                    )
                    M.maintain_stores(spark, {store: None})
                check(step, op)

            # end-of-run full differential: every structure answers as a
            # fresh build over the live corpus
            live_docs = docs_df(sorted(model))
            S.build_inverted_index(spark, live_docs, f"{tag}_refix")
            terms = [WORDS[0], WORDS[3], WORDS[7]]
            assert [
                tuple(r)
                for r in S.search_indexed(spark, ix, terms).collect()
            ] == [
                tuple(r)
                for r in S.search_indexed(
                    spark, f"{tag}_refix", terms
                ).collect()
            ], f"seed {seed}: postings differential"

            DI.build_lsh_index(spark, live_docs, f"{tag}_reflsh")
            probe = docs_df(list(range(1000, 1012)))
            assert sorted(
                tuple(r)
                for r in DI.probe_lsh_index(spark, probe, lsh).collect()
            ) == sorted(
                tuple(r)
                for r in DI.probe_lsh_index(
                    spark, probe, f"{tag}_reflsh"
                ).collect()
            ), f"seed {seed}: lsh differential"

            if model:
                fresh_ivf = str(tmp_path / f"cmp_ivf_ref_{seed}")
                embs = embs_df(sorted(model))
                (
                    embs.join(
                        SIM._cell_assignments(embs, centroids, cnorms),
                        "vec_id",
                    )
                    .write.mode("overwrite")
                    .partitionBy("cell")
                    .parquet(fresh_ivf)
                )
                got_rows = sorted(
                    (r["vec_id"], r["cell"], tuple(r["embedding"]))
                    for r in spark.read.parquet(ivf_dir).collect()
                )
                want_rows = sorted(
                    (r["vec_id"], r["cell"], tuple(r["embedding"]))
                    for r in spark.read.parquet(fresh_ivf).collect()
                )
                assert got_rows == want_rows, (
                    f"seed {seed}: ivf differential"
                )
        finally:
            _drop(spark, tag)
