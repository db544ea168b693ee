"""Cross-validation against Spark's OWN MLlib implementations: the
engine's hand-built MinHash-LSH dedup pipeline is checked against
pyspark.ml.feature.MinHashLSH on the same corpus — an independent,
widely-deployed implementation of the same algorithm. Two pins:

1. Exact-Jaccard agreement: for pairs both pipelines surface, MLlib's
   (1 - JaccardDistance) must equal our exact_jaccard_on_pairs value.
2. Recall on brute-force ground truth: at Jaccard >= 0.7 (the regime
   the 8-band × 2-row banding is tuned for) the hand-built candidate
   generator must surface >= 95% of true pairs — the level the
   wrapped-K-M hash family provides (see the _KM_P comment in
   llm/dedup.py; the UNwrapped family regressed to ~77% and this test
   is the tripwire against reintroducing that).

Everything is deterministic (md5-derived families, fixed ML seed), so
these are exact regression pins, not flaky statistical checks.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from chess_pos_db_spark.llm import dedup
from chess_pos_db_spark.tables import t


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return t(spark, sf_dir, "documents").select("doc_id", "text").cache()


def _ground_truth_pairs(docs, threshold=0.5):
    """Brute-force exact Jaccard over collected token sets (test-only;
    the whole point of the production path is to never do this)."""
    toks = {
        r["doc_id"]: set(r["text"].split(" ")) for r in docs.collect()
    }
    out = {}
    for a, b in combinations(sorted(toks), 2):
        inter = len(toks[a] & toks[b])
        if inter == 0:
            continue
        j = inter / len(toks[a] | toks[b])
        if j >= threshold:
            out[(a, b)] = j
    return out


def _ml_pairs(spark, docs, threshold=0.5):
    """MLlib MinHashLSH approxSimilarityJoin at jaccard >= threshold."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    tokened = docs.select("doc_id", F.split("text", " ").alias("tokens"))
    cv = CountVectorizer(
        inputCol="tokens", outputCol="vec", binary=True, minDF=1.0
    ).fit(tokened)
    vecs = cv.transform(tokened).select("doc_id", "vec")
    lsh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, 1.0 - threshold + 1e-9, distCol="jdist"
    )
    pairs = (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (1.0 - F.col("jdist")).alias("ml_jaccard"),
        )
    )
    return {(r.doc_a, r.doc_b): r.ml_jaccard for r in pairs.collect()}


def test_exact_jaccard_agrees_with_mllib(spark, docs):
    ml = _ml_pairs(spark, docs, threshold=0.5)
    if not ml:
        pytest.skip("no similar pairs at this SF")
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b in ml], "doc_a long, doc_b long"
    )
    ours = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.exact_jaccard_on_pairs(docs, pairs_df).collect()
    }
    for pair, mlj in ml.items():
        assert pair in ours
        # exact_jaccard_on_pairs rounds to 4 decimals for the oracle
        assert abs(ours[pair] - mlj) < 5e-5, pair


def test_banding_recall_on_ground_truth(spark, docs):
    """>= 95% of true Jaccard>=0.7 pairs must appear in the banding
    candidates (deterministic md5 family — exact regression pin)."""
    truth = _ground_truth_pairs(docs, threshold=0.7)
    if not truth:
        pytest.skip("no similar pairs at this SF")
    sig = dedup.minhash_signatures(docs)
    ours = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(sig).collect()
    }
    recall = len(set(truth) & ours) / len(truth)
    assert recall >= 0.95, f"banding recall {recall:.4f} over {len(truth)} pairs"
