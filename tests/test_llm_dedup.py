"""Dedup-pipeline soundness (N2): the exact-verify stage must stop
band-collision false positives from merging non-duplicate clusters,
while true near-duplicates still cluster.
"""

from __future__ import annotations

import hashlib
import itertools
import random

import pytest

from chess_pos_db_spark.llm import dedup


# --- pure-python replica of the engine's minhash (for fixture search) --------


def _km(token: str) -> tuple[int, int]:
    h = hashlib.md5(token.encode()).hexdigest()
    return int(h[0:15], 16) % dedup._KM_MOD, int(h[15:30], 16) % dedup._KM_MOD


def _signature(tokens: set[str]) -> list[int]:
    hks = [_km(t) for t in tokens]
    return [
        min(h1 + i * h2 for h1, h2 in hks)
        for i in range(dedup.NUM_HASHES)
    ]


def _bands(sig: list[int]) -> list[tuple[int, ...]]:
    r = dedup.ROWS_PER_BAND
    return [tuple(sig[b * r : (b + 1) * r]) for b in range(dedup._N_BANDS)]


def _jaccard(a: set[str], b: set[str]) -> float:
    return len(a & b) / len(a | b)


def _find_false_positive() -> tuple[set[str], set[str]]:
    """Deterministically search for two docs with exact Jaccard BELOW
    the verify threshold that still share an LSH band (a banding false
    positive). With J≈1/3 the per-band collision odds are ≈J²·8 ≈ 60%,
    so the search terminates almost immediately."""
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for _ in range(60):
        docs.append(set(rng.sample(vocab, 4)))
    for a, b in itertools.combinations(docs, 2):
        j = _jaccard(a, b)
        if j >= dedup.VERIFY_JACCARD_THRESHOLD or not (a & b):
            continue
        if set(_bands(_signature(a))) & set(_bands(_signature(b))):
            return a, b
    raise AssertionError("no banding false positive found in search space")


@pytest.fixture(scope="module")
def fp_docs(spark):
    a, b = _find_false_positive()
    df = spark.createDataFrame(
        [
            (1, " ".join(sorted(a))),
            (2, " ".join(sorted(b))),
            (3, "completely unrelated text about nothing at all"),
        ],
        "doc_id long, text string",
    )
    return df, _jaccard(a, b)


def test_banding_emits_false_positive(fp_docs):
    """Precondition: the crafted pair IS an LSH candidate despite its
    exact Jaccard being below threshold."""
    df, j = fp_docs
    assert j < dedup.VERIFY_JACCARD_THRESHOLD
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(df)
        ).collect()
    }
    assert (1, 2) in cands


def test_verify_stage_rejects_false_positive(fp_docs):
    df, _ = fp_docs
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.verified_candidate_pairs(df).collect()
    }
    assert (1, 2) not in verified


def test_unverified_components_merge_verified_do_not(fp_docs):
    """The headline soundness property: raw-LSH clustering merges the
    false-positive pair into one cluster; verified clustering keeps
    them apart."""
    df, _ = fp_docs
    raw = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.component_labels(df).collect()
    }
    assert raw[1] == raw[2]  # the unsound merge
    ver = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.component_labels(
            df, dedup.verified_candidate_pairs(df)
        ).collect()
    }
    assert ver[1] != ver[2]
    assert ver[3] not in (ver[1], ver[2])


def test_true_duplicates_still_cluster(spark):
    """A genuine near-duplicate pair (reordered tokens, J=1) must
    survive the verify stage and cluster together."""
    df = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),
            (11, "zeta epsilon delta gamma beta alpha"),
            (12, "totally different content here entirely now"),
        ],
        "doc_id long, text string",
    )
    ver = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.component_labels(
            df, dedup.verified_candidate_pairs(df)
        ).collect()
    }
    assert ver[10] == ver[11]
    assert ver[12] != ver[10]


def test_hll_mergeable_rollup_accuracy(spark, sf_dir):
    """A6 scale path: per-group HLL estimates within 5% of exact, and
    the sketch UNION's total estimate within 5% of the true whole-table
    distinct (which group-sum overcounts when keys span groups)."""
    import chess_pos_db_spark as engine
    from chess_pos_db_spark.tables import t as load

    rows = engine.get_queries()["agg_hll_mergeable"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["est_distinct"] - r["exact_distinct"]) <= max(
            2, 0.05 * r["exact_distinct"]
        )
    true_total = (
        load(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    est_total = rows[0]["est_total_distinct"]
    assert abs(est_total - true_total) <= max(2, 0.05 * true_total)


def test_kll_mergeable_rollup_accuracy(spark, sf_dir):
    """A6/W7 scale path: per-group KLL median estimates must land
    within KLL's rank-error band (k=200 -> ~1.65% rank error; we allow
    the 42nd-58th percentile window to be safely loose), and the merged
    total-median must satisfy the same bound against the whole table —
    the merge path can't degrade beyond the sketch guarantee."""
    import chess_pos_db_spark as engine
    from chess_pos_db_spark.tables import t as load

    rows = engine.get_queries()["agg_kll_mergeable"](spark, sf_dir).collect()
    assert rows
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    bands = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.42)").alias("lo"),
            F.expr("percentile(l_quantity, 0.58)").alias("hi"),
        )
        .collect()
    }
    for r in rows:
        lo, hi = bands[r["l_returnflag"]]
        assert lo <= r["est_median"] <= hi, (r["l_returnflag"], lo, r["est_median"], hi)
    tot = li.agg(
        F.expr("percentile(l_quantity, 0.42)").alias("lo"),
        F.expr("percentile(l_quantity, 0.58)").alias("hi"),
    ).collect()[0]
    assert tot["lo"] <= rows[0]["est_total_median"] <= tot["hi"]


# --- large-star/small-star contraction (the 100 TB CC path) ------------------


def _label_partition(rows):
    """cluster ids are only meaningful up to renaming: reduce to the
    partition (frozenset of frozensets) they induce."""
    by_label: dict[int, set[int]] = {}
    for r in rows:
        by_label.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    return frozenset(frozenset(s) for s in by_label.values())


@pytest.mark.slow
def test_contraction_equals_propagation_on_graphs(spark):
    """Chain, star, diamond, singleton — contraction and min-label
    propagation must produce identical (doc_id, cluster_id) tables
    (both label with the component min, so equality is exact, not just
    partition-equal)."""
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 12)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),   # chain 1-5
            (6, 7), (6, 8), (6, 9),           # star rooted low
            (10, 11), (10, 5),                # bridges chain to 10,11
        ],
        "doc_a long, doc_b long",
    )
    prop = dedup.component_labels(docs, pairs).collect()
    cont = dedup.contraction_labels(docs, pairs).collect()
    assert sorted(map(tuple, prop)) == sorted(map(tuple, cont))
    # one merged component {1..5,10,11}, one star {6..9}
    part = _label_partition(cont)
    assert frozenset({1, 2, 3, 4, 5, 10, 11}) in part
    assert frozenset({6, 7, 8, 9}) in part


def test_contraction_equals_propagation_on_fixture(spark, sf_dir):
    """On the real documents fixture with real LSH candidate pairs."""
    from chess_pos_db_spark.tables import t

    docs = t(spark, sf_dir, "documents")
    prop = dedup.component_labels(docs).collect()
    cont = dedup.contraction_labels(docs).collect()
    assert sorted(map(tuple, prop)) == sorted(map(tuple, cont))


# --- paragraph-level (CCNet-style) dedup -------------------------------------


def test_paragraph_dedup_removes_shared_chunk(spark):
    """Two docs share an identical 20-token chunk: the earlier doc keeps
    it, the later doc loses exactly that chunk and keeps its own."""
    shared = " ".join(f"s{i}" for i in range(dedup.PARA_TOKENS))
    own_a = " ".join(f"a{i}" for i in range(dedup.PARA_TOKENS))
    own_b = " ".join(f"b{i}" for i in range(dedup.PARA_TOKENS))
    docs = spark.createDataFrame(
        [(1, shared + " " + own_a), (2, own_b + " " + shared)],
        "doc_id long, text string",
    )
    arr_rows = {
        r["doc_id"]: r
        for r in dedup.paragraph_dedup(docs).collect()
    }
    assert arr_rows[1]["clean_text"] == shared + " " + own_a
    assert arr_rows[1]["n_paras_kept"] == 2
    assert arr_rows[2]["clean_text"] == own_b
    assert arr_rows[2]["n_paras_kept"] == 1
    assert arr_rows[2]["n_paras_total"] == 2



def test_hll_intersect_inclusion_exclusion(spark, sf_dir):
    """HLL overlap estimate: est_intersect = est_a + est_b - est_union
    by construction, and within 5% of the exact intersection (the
    inclusion-exclusion error envelope at this sketch size)."""
    import duckdb

    import chess_pos_db_spark as engine

    row = (
        engine.get_queries()["agg_hll_intersect"](spark, sf_dir).collect()[0]
    )
    assert abs(
        row["est_intersect"] - (row["est_a"] + row["est_b"] - row["est_union"])
    ) < 1e-6
    con = duckdb.connect()
    exact = con.execute(
        f"""
SELECT COUNT(*) FROM (
  SELECT DISTINCT l_orderkey
  FROM read_parquet('{sf_dir}/lineitem.parquet') WHERE l_returnflag='N'
  INTERSECT
  SELECT DISTINCT l_orderkey
  FROM read_parquet('{sf_dir}/lineitem.parquet') WHERE l_linestatus='F'
)"""
    ).fetchone()[0]
    assert abs(row["est_intersect"] - exact) / max(1, exact) < 0.05


def test_simhash_packed_counter_overflow_guard(spark, tmp_path):
    """A document at the 2^21-token packing limit must RAISE, not
    silently overflow its 21-bit counter into the adjacent field (the
    bound is enforced in the aggregate, not just documented)."""
    import chess_pos_db_spark as engine

    # Alternate two tokens whose md5 bit patterns never BOTH set a
    # shift-42 field bit (verified offline: md5('tok4') & md5('tok124')
    # on positions i≡2 mod 3 is empty), so the int64 SUM itself cannot
    # hit Spark's ANSI ARITHMETIC_OVERFLOW first — the per-field guard
    # is what must fire.
    big = spark.range(1).selectExpr(
        "1L AS doc_id",
        "'synthetic' AS source",
        f"array_join(flatten(array_repeat(array('tok4', 'tok124'), {1 << 20})), ' ')"
        " || ' tok4 tok124' AS text",  # 2^21 + 2 tokens: past the limit
    )
    big.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    q = engine.get_queries()["dedup_simhash"]
    with pytest.raises(Exception, match="2\\^21 tokens"):
        q(spark, str(tmp_path)).collect()
