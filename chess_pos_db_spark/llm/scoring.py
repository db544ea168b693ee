"""Corpus-statistics scoring operators (SURVEY.md §2.11 N-block
extensions): count-based LM familiarity, kNN label prediction, and
embedding-cluster cohesion.

These close the loop between the counting passes (text_ngram_counts,
text_tfidf) and per-document / per-cluster DECISIONS a training
pipeline makes from them:

- ``text_lm_familiarity`` scores each document against the corpus
  bigram table — the count-based stand-in for perplexity filtering
  (CCNet-style: keep documents whose n-grams the reference corpus has
  seen). Every metric is an EXACT INTEGER or a ratio of exact integers,
  so the score is bit-identical across engines (the lang-ID
  discipline) — no log-probabilities, which would put transcendental
  floats in the oracle path.
- ``similarity_knn_label`` predicts a label for held-out vectors by
  majority vote over their cosine top-k — the standard embedding-space
  label-propagation / auto-labeling pass.
- ``embedding_label_cohesion`` measures how tight each labeled cluster
  is around its centroid — the quality gate run before trusting labels
  (or cluster assignments) for curation.

Scale notes: familiarity shuffles (gram) once — the corpus count is a
window over the gram partition (the text_tfidf trick: no groupBy +
join-back, saves two exchanges) — then (doc_id) once with partial
aggregation. kNN broadcasts the bounded probe set (the query-side IS
the small side by construction) and scans the corpus once; the top-k
per probe is a window over probe_id partitions, never a global sort.
Cohesion explodes to (label, dim) — 64 rows/vector, map-side combined
to n_labels×64 — then one broadcast-sized join back. None of the three
ever joins corpus×corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import t
from .pipeline import _shingle_sql, _shingles
from .similarity import _DIMS, cosine

_KNN_K = 10
_N_PROBES = 20  # vec_id < 20 are the held-out probe set


# ---------------------------------------------------------------------------
# N4+ — count-based LM familiarity: per-document novelty vs the corpus
# bigram table. `hapax_bigrams` counts bigrams whose CORPUS frequency
# is 1 (this document is their only occurrence — pure novelty);
# `familiar_mass` sums each bigram occurrence's corpus count (how
# well-trodden the document's phrasing is). A perplexity filter keeps
# low-novelty / high-mass documents; ratios of exact integers keep the
# oracle bit-exact.
# ---------------------------------------------------------------------------


@register(
    "text_lm_familiarity",
    oracle=f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents),
g AS (
    SELECT doc_id, {_shingle_sql(2)} AS bigram
    FROM tok WHERE len(s) >= 2
),
cnt AS (
    SELECT doc_id, bigram,
           COUNT(*) OVER (PARTITION BY bigram) AS corpus_cnt
    FROM g
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT)                              AS n_bigrams,
       CAST(SUM(corpus_cnt) AS BIGINT)                       AS familiar_mass,
       CAST(SUM(CASE WHEN corpus_cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS hapax_bigrams,
       CAST(SUM(CASE WHEN corpus_cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*)                                        AS novelty
FROM cnt
GROUP BY doc_id
""",
)
def text_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    g = docs.withColumn("_toks", F.split("text", " ")).select(
        "doc_id", F.explode(_shingles(2, F.col("_toks"))).alias("bigram")
    )
    cnt = g.withColumn(
        "corpus_cnt", F.count("*").over(Window.partitionBy("bigram"))
    )
    hapax = F.sum(F.when(F.col("corpus_cnt") == 1, 1).otherwise(0))
    return cnt.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("corpus_cnt").alias("familiar_mass"),
        hapax.alias("hapax_bigrams"),
        (hapax.cast("double") / F.count("*")).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# N3+ — kNN label prediction: for each probe vector (vec_id < 20, its
# own label held out), the majority label among its cosine top-k
# neighbours in the rest of the corpus. Cosines are rounded at 6dp on
# both sides BEFORE the rank (the similarity_topk discipline) and every
# ordering carries a full tie-break, so neighbour sets — and therefore
# votes — are deterministic. `correct` makes the query double as an
# accuracy audit of the embedding space.
# ---------------------------------------------------------------------------


@register(
    "similarity_knn_label",
    oracle=f"""
WITH probes AS (
    SELECT vec_id AS probe_id, embedding AS qv, label AS true_label
    FROM embeddings WHERE vec_id < {_N_PROBES}
),
scored AS (
    SELECT p.probe_id, p.true_label, e.vec_id, e.label,
           ROUND(
             SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE))
             / (SQRT(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                * SQRT(SUM(CAST(p.qv[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE)))),
             6) AS cos_sim
    FROM embeddings e, probes p, GENERATE_SERIES(1, {_DIMS}) AS t(i)
    WHERE e.vec_id >= {_N_PROBES}
    GROUP BY p.probe_id, p.true_label, e.vec_id, e.label
),
topk AS (
    SELECT probe_id, true_label, label,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cos_sim DESC, vec_id) AS rk
    FROM scored
),
votes AS (
    SELECT probe_id, true_label, label, COUNT(*) AS n_votes
    FROM topk WHERE rk <= {_KNN_K}
    GROUP BY probe_id, true_label, label
)
SELECT probe_id, CAST(true_label AS INT) AS true_label,
       CAST(label AS INT) AS predicted, CAST(n_votes AS BIGINT) AS n_votes,
       (label = true_label) AS correct
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                 ORDER BY n_votes DESC, label) AS vr
    FROM votes
) WHERE vr = 1
""",
)
def similarity_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    scored = (
        emb.filter(F.col("vec_id") >= _N_PROBES)
        .crossJoin(F.broadcast(probes))
        .select(
            "probe_id",
            "true_label",
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias(
                "cos_sim"
            ),
        )
    )
    rk = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    votes = (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _KNN_K)
        .groupBy("probe_id", "true_label", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    vr = Window.partitionBy("probe_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(vr))
        .filter(F.col("vr") == 1)
        .select(
            "probe_id",
            "true_label",
            F.col("label").alias("predicted"),
            "n_votes",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# N3+ — per-label cluster cohesion: each member's cosine to its label
# centroid (relational per-dimension centroid, the similarity_ivf
# quantizer pattern — posexplode → avg per (label, dim)), summarized as
# min / max member cosine plus a 4dp mean. min and max of 6dp-rounded
# member cosines are order-independent (exact across engines); only the
# mean aggregates unrounded sums, hence its coarser rounding.
# ---------------------------------------------------------------------------


@register(
    "embedding_label_cohesion",
    oracle=f"""
WITH dims AS (
    SELECT vec_id, label, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
    FROM embeddings, GENERATE_SERIES(1, {_DIMS}) AS t(i)
),
cent AS (
    SELECT label, dim, AVG(v) AS c
    FROM dims GROUP BY label, dim
),
member AS (
    SELECT d.vec_id, d.label,
           ROUND(SUM(d.v * c.c)
                 / (SQRT(SUM(d.v * d.v)) * SQRT(SUM(c.c * c.c))), 6) AS cos_c
    FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
    GROUP BY d.vec_id, d.label
)
SELECT CAST(label AS INT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(cos_c)               AS loosest,
       MAX(cos_c)               AS tightest,
       ROUND(AVG(cos_c), 4)     AS mean_cohesion
FROM member
GROUP BY label
""",
)
def embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "v0"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("v0").cast("double").alias("v"),
    )
    cent = dims.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    member = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum(F.col("v") * F.col("c"))
                / (
                    F.sqrt(F.sum(F.col("v") * F.col("v")))
                    * F.sqrt(F.sum(F.col("c") * F.col("c")))
                ),
                6,
            ).alias("cos_c")
        )
    )
    return member.groupBy("label").agg(
        F.count("*").alias("n_members"),
        F.min("cos_c").alias("loosest"),
        F.max("cos_c").alias("tightest"),
        F.round(F.avg("cos_c"), 4).alias("mean_cohesion"),
    )
