"""Deduplication operators (SURVEY.md §2.11 N1/N2 — north-star block).

Scale design:
- exact dedup is a hash-groupBy on a digest of the text, never on the
  raw text (at 100 TB the shuffle moves 16-byte digests, not documents);
- n-gram Jaccard is the exact verification pass: explode → distinct
  (doc, token) → self-join on token → pair counts. The token join is
  the classic near-dup verify step and shuffles only (doc_id, token)
  pairs;
- MinHash+LSH is the scale path: fixed-seed xxhash64 family →
  per-band signature → bucket join, so candidate generation touches
  only band-bucket collisions instead of all O(n²) pairs. Not
  SQL-oracle-expressible → rows-only check, covered by pytest
  invariants instead;
- SimHash: 64-bit signed-bit-accumulation fingerprint, hamming-style
  near-dup at scale; deterministic, rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t

# ---------------------------------------------------------------------------
# N1 — exact dedup via content digest.
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
SELECT doc_id, lang
FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
    FROM documents
)
WHERE rn = 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )


@register(
    "dedup_exact_groups",
    oracle="""
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT)    AS n_copies
FROM documents
GROUP BY MD5(text)
""",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    ).select("keep_id", "n_copies")


# ---------------------------------------------------------------------------
# N2a — exact n-gram (token-set) Jaccard similarity join: all pairs with
# Jaccard >= 0.5 (doc_a < doc_b). The distinct-token self-join form is
# oracle-expressible, so this is the verified near-dup path.
# ---------------------------------------------------------------------------


@register(
    "dedup_jaccard",
    oracle="""
WITH tok AS (
    SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
),
sizes AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY doc_id
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       ROUND(p.n_shared * 1.0 / (sa.n_tok + sb.n_tok - p.n_shared), 4) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.n_shared * 1.0 / (sa.n_tok + sb.n_tok - p.n_shared) >= 0.5
""",
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared") / (F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_shared"))
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# N2b — MinHash + LSH banding (the 100 TB candidate-generation path).
# Signature: for each of NUM_HASHES fixed-seed hash functions, the min of
# xxhash64(token, seed) over the doc's distinct tokens. Bands of ROWS_PER_BAND
# signature slots are hashed to buckets; docs sharing any band bucket are
# candidates. Deterministic (fixed seeds), rows-only check.
# ---------------------------------------------------------------------------

NUM_HASHES = 16
ROWS_PER_BAND = 2  # 8 bands → catches pairs with Jaccard ≳ 0.5


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → minhash_0..minhash_{NUM_HASHES-1} (one row per doc)."""
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    aggs = [
        F.min(F.xxhash64("token", F.lit(i))).alias(f"mh_{i}")
        for i in range(NUM_HASHES)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


@register("dedup_near")  # rows-only: LSH banding is not ANSI-SQL-expressible
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    n_bands = NUM_HASHES // ROWS_PER_BAND
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    # Each band value carries its band index so collisions must be in the
    # SAME band: posexplode yields (band_idx, band_hash).
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return cand.orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# N2b' — MinHash signature CLUSTERING: docs whose full 16-slot signature is
# identical are treated as one near-dup cluster; output keeps the min doc_id
# per cluster. Unlike pair generation this is linear (one groupBy), which is
# the shape you actually run at 100 TB to dedupe a corpus.
# ---------------------------------------------------------------------------


@register("dedup_minhash_cluster")  # rows-only: minhash values are Spark-native
def dedup_minhash_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    sig_key = F.xxhash64(*[F.col(f"mh_{i}") for i in range(NUM_HASHES)])
    return (
        sig.groupBy(sig_key.alias("cluster_sig"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_members"),
        )
        .select("keep_id", "n_members")
    )


# ---------------------------------------------------------------------------
# N2c — SimHash 64-bit fingerprint: sign-sum of per-token hash bits.
# Rows-only (bit loop is Spark-native), deterministic.
# ---------------------------------------------------------------------------


@register("dedup_simhash")  # rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    h = F.xxhash64("token")
    # For each of 64 bits: +1 if set else -1; sum per doc; bit i of the
    # fingerprint = (sum_i > 0). Expressed as 64 conditional aggregates —
    # one shuffle, map-side combined.
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit_{i}")
        for i in range(64)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_aggs)
    fingerprint = None
    for i in range(64):
        bit = F.when(F.col(f"bit_{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseXOR(term)
    return sums.select("doc_id", fingerprint.alias("simhash"))


# --- embedding-cosine near-duplicate pairs (N2 scale family) -----------------


@register(
    "dedup_embedding_cosine",
    oracle="""
WITH pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot,
           SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS na,
           SUM(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS nb
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id,
         GENERATE_SERIES(1, 64) AS t(i)
    GROUP BY a.vec_id, b.vec_id
)
SELECT id_a, id_b, ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS cos_sim
FROM pairs
WHERE dot / (SQRT(na) * SQRT(nb)) > 0.45
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cos > threshold).

    This is the oracle-able exact baseline: an O(n^2) self-join with the
    dot product as JVM-side higher-order array functions. At 100 TB the
    quadratic pair space is pruned FIRST by sign-LSH bucketing
    (`similarity.sign_lsh_bucket`) or IVF cells (`similarity_ivf`) so
    only same-bucket candidates reach this exact verifier — the standard
    two-phase (candidate generation -> exact check) dedup pipeline; the
    exact check itself is identical to this query.
    """
    from .similarity import cosine

    emb = t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") > 0.45)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_sim"))
    )


# --- n-gram (shingle) Jaccard near-dup (N2, the shingled exact form) ---------


@register(
    "dedup_ngram_jaccard",
    oracle="""
WITH sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(s[1:len(s)-2]) || ' ' || unnest(s[2:len(s)-1])
                   || ' ' || unnest(s[3:len(s)]) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
    )
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.5
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-shingle Jaccard near-duplicate pairs — the n-gram form of
    dedup_jaccard (word reorderings that preserve unigram sets no longer
    count as duplicates). Shingling is a pure JVM higher-order
    expression; the shared-shingle equi-join is the candidate generator
    (at 100 TB the MinHash/LSH banding of dedup_near replaces it, with
    this as the verifier on candidates)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            # sequence() descends when stop < start, so the >=3 guard is
            # load-bearing for docs shorter than one shingle
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = docs.select(
        "doc_id", F.explode(shingles).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("shared") / (F.col("sa.n") + F.col("sb.n") - F.col("shared"))
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
