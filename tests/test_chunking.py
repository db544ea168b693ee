"""Semantics + plan shape for the chunking / containment / weighted
sampling / interval-overlap operators (round-3 N-block additions).
Oracle exactness is covered by tests/test_oracle.py; these tests pin
the properties the oracle can't see: reconstruction invariants,
asymmetric-containment behavior on crafted docs, brute-force parity
for the bucketed interval join, and sampling bias/determinism.
"""

from __future__ import annotations

import chess_pos_db_spark as engine
from chess_pos_db_spark.llm.chunking import chunk_docs, containment_pairs
from chess_pos_db_spark.llm.chunking import CHUNK_STRIDE, CHUNK_TOKENS


def q(name, spark, sf_dir):
    return engine.get_queries()[name](spark, sf_dir)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- chunker


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Concatenating chunk 0 with the tail (beyond the C-S overlap) of
    every subsequent chunk must reproduce each document's exact token
    stream — no token lost, duplicated (outside the overlap), or
    reordered."""
    from chess_pos_db_spark.tables import t as load

    out = q("text_chunk_overlap", spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split(" ")
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        assert sorted(chunks) == list(range(len(chunks)))  # dense ordinals
        rebuilt = list(chunks[0])
        for i in range(1, len(chunks)):
            assert chunks[i][:overlap] == rebuilt[-overlap:], doc_id
            rebuilt.extend(chunks[i][overlap:])
        assert rebuilt == docs[doc_id], doc_id
        assert all(len(c) <= CHUNK_TOKENS for c in chunks.values())


def test_chunker_is_map_only(spark, sf_dir):
    """The chunker must run at scan speed: zero shuffle exchanges."""
    plan = _plan(q("text_chunk_overlap", spark, sf_dir))
    assert "Exchange" not in plan, plan[:2000]


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_docs(df).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c"
    assert rows[0]["chunk_tokens"] == 3


# ---------------------------------------------------------- containment


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much larger one:
    containment(A->B) = 1.0 while Jaccard stays far below any
    near-dup threshold — the case the asymmetric operator exists for."""
    a_tokens = [f"q{i}" for i in range(10)]
    b_tokens = a_tokens + [f"fill{i}" for i in range(90)]
    df = spark.createDataFrame(
        [
            (1, " ".join(a_tokens)),
            (2, " ".join(b_tokens)),
            (3, " ".join(f"z{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"] for r in
             containment_pairs(df).collect()}
    assert pairs.get((1, 2)) == 1.0  # A fully inside B
    assert (2, 1) not in pairs  # B is NOT inside A
    assert not any(3 in p for p in pairs)
    jacc = 10 / 100
    assert jacc < 0.5  # symmetric-jaccard query would never emit this pair


# ------------------------------------------------------ interval overlap


def test_interval_overlap_matches_bruteforce(spark, sf_dir):
    """The bucketed plan must equal the quadratic definition exactly
    (same pairs, counted once each, exact micro overlap sums)."""
    from chess_pos_db_spark.operators.events import _IVL_LEN_US
    from chess_pos_db_spark.tables import t as load

    ev = load(spark, sf_dir, "events").collect()
    clicks = [(r["event_id"], int(r["ts"].timestamp() * 1_000_000))
              for r in ev if r["event_type"] == "click"]
    buys = [(r["event_id"], int(r["ts"].timestamp() * 1_000_000))
            for r in ev if r["event_type"] == "purchase"]
    brute: dict[int, tuple[int, int]] = {}
    for cid, cu in clicks:
        n = tot = 0
        for _, bu in buys:
            if cu <= bu + _IVL_LEN_US and bu <= cu + _IVL_LEN_US:
                n += 1
                tot += _IVL_LEN_US - abs(cu - bu)
        if n:
            brute[cid] = (n, tot)
    expected = sorted(
        ((cid, n, tot) for cid, (n, tot) in brute.items()),
        key=lambda x: (-x[1], x[0]),
    )[:50]
    got = [
        (r["click_id"], r["n_overlaps"], r["total_overlap_us"])
        for r in q("join_interval_overlap", spark, sf_dir).collect()
    ]
    assert got == expected


def test_interval_overlap_no_cartesian(spark, sf_dir):
    plan = _plan(q("join_interval_overlap", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


# ------------------------------------------------------ weighted sample


def test_weighted_sample_biased_and_deterministic(spark, sf_dir):
    from chess_pos_db_spark.tables import t as load

    sample = q("sample_weighted", spark, sf_dir).collect()
    again = q("sample_weighted", spark, sf_dir).collect()
    assert [r["doc_id"] for r in sample] == [r["doc_id"] for r in again]
    corpus_mean = (
        load(spark, sf_dir, "documents").groupBy().avg("n_chars").collect()[0][0]
    )
    sample_mean = sum(r["n_chars"] for r in sample) / len(sample)
    # weight = n_chars, so long docs are overrepresented; a uniform sample
    # matches the corpus mean in expectation, the weighted one must exceed it
    assert sample_mean > corpus_mean


def test_chunker_drops_null_text_docs(spark):
    """NULL-text documents produce NO chunks: without the filter,
    F.greatest skips the NULL size and resurrects start=1, emitting a
    phantom chunk whose chunk_text is '' on Spark but NULL in SQL —
    both a garbage row for the embedding stage and a cross-engine
    divergence the fixtures (never-NULL text) cannot catch."""
    docs = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string"
    )
    out = chunk_docs(docs).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_containment_denominator_is_uncapped_vocab(spark):
    """The df cap bounds the INTERSECTION join, not the denominator: a
    doc whose vocabulary is mostly common (capped-away) tokens must
    not read as contained just because its few rare tokens are shared.
    cap=2 here: c1..c3 (df=4) are capped away for doc A, leaving
    rare={x,y}; B shares both. A capped denominator would report
    C(A->B)=2/2=1.0; the full-vocab denominator reports 2/5=0.4."""
    rows = [
        (1, "x y c1 c2 c3"),          # A
        (2, "x y q r s t u v"),       # B
        (3, "c1 c2 c3"),
        (4, "c1 c2 c3"),
        (5, "c1 c2 c3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(docs, cap=2, threshold=0.1).collect()
    }
    assert got.get((1, 2)) == 0.4
    high = containment_pairs(docs, cap=2, threshold=0.8).collect()
    assert (1, 2) not in {(r["doc_a"], r["doc_b"]) for r in high}
