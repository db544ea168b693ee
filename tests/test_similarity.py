"""ANN quality gates (N3): the trained-IVF path must actually find the
true neighbors — recall@10 ≥ 0.9 against brute-force cosine on the
sf0.01 embeddings — and training must be deterministic.
"""

from __future__ import annotations

import numpy as np

from chess_pos_db_spark.llm import similarity as sim


def test_ivf_trained_recall(spark, sf_dir):
    truth = [r["vec_id"] for r in sim.similarity_topk(spark, sf_dir).collect()]
    got = {
        r["vec_id"]
        for r in sim.similarity_ivf_trained(spark, sf_dir).collect()
    }
    recall = sum(1 for v in truth if v in got) / len(truth)
    assert recall >= 0.9, (recall, truth, sorted(got))


def test_ivf_trained_centroids_deterministic(spark, sf_dir):
    c1, n1 = sim._ivf_trained_centroids(spark, sf_dir)
    c2, n2 = sim._ivf_trained_centroids(spark, sf_dir)
    assert np.array_equal(c1, c2)
    assert np.array_equal(n1, n2)
    assert c1.shape == (sim._IVF_K, sim._DIMS)
    # centroids are unit-normalized (cosine-space k-means)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_layout_partition_pruning(spark, sf_dir, tmp_path):
    """The IVF-as-layout scale path: results identical to the in-query
    trained IVF, and the probe reaches the scan as a PARTITION filter —
    only nprobe of K cell directories are read."""
    out = str(tmp_path / "ivf")
    centroids, cnorms = sim.write_ivf_layout(spark, sf_dir, out)
    df = sim.ivf_query_layout(spark, out, centroids, cnorms)
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(", plan), plan[:2000]

    got = [(r["vec_id"], r["cos_sim"]) for r in df.collect()]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in sim.similarity_ivf_trained(spark, sf_dir).collect()
    ]
    assert got == want
    # pruning is real: fewer files read than cell directories exist
    import glob

    n_cells = len(glob.glob(f"{out}/cell=*"))
    assert n_cells > sim._IVF_NPROBE


def test_ivf_trained_beats_or_matches_untrained_recall(spark, sf_dir):
    """The point of training: recall from k-means cells should be at
    least as good as the untrained lowest-vec_id quantizer's."""
    truth = [r["vec_id"] for r in sim.similarity_topk(spark, sf_dir).collect()]
    untrained = {
        r["vec_id"] for r in sim.similarity_ivf(spark, sf_dir).collect()
    }
    trained = {
        r["vec_id"]
        for r in sim.similarity_ivf_trained(spark, sf_dir).collect()
    }
    r_u = sum(1 for v in truth if v in untrained)
    r_t = sum(1 for v in truth if v in trained)
    assert r_t >= r_u
