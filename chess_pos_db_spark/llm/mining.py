"""Corpus-mining operators for the training-data pipeline (SURVEY.md
§2.11 N-block extensions): repeated-substring inventory, per-document
duplicated-span fractions, intra-document repetition signals, and
source mixing weights.

These are the scan-shaped hygiene passes a pre-training pipeline runs
between raw crawl and tokenization — substring-level dedup (the
ExactSubstr idea from Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better", approximated at fixed n-gram
granularity), repetition-based quality filters (the Falcon/RefinedWeb
heuristics), and DoReMi-style domain reweighting. All are expressed as
built-in DataFrame ops (explode → groupBy / window), map-side combined,
and every ratio divides EXACT INTEGER counts so both engines produce
bit-identical doubles (the lang-ID integer-ratio discipline).

Scale notes: every operator here shuffles n-gram or (doc, token) keys
once with partial aggregation; none ever joins doc×doc. The per-gram
document frequency reuses the window-count trick (count over partition
instead of groupBy+join-back) that saves two exchanges — see
text_tfidf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..hashing import md5_long_duck, md5_long_sql
from ..registry import register
from ..tables import t
from .pipeline import _shingle_sql, _shingles

_SUB_N = 8  # substring granularity in tokens: long enough that shared
# spans are near-certain duplication, short enough to catch partial
# overlap (the reference point is 50 tokens at real corpus scale)


# ---------------------------------------------------------------------------
# N2s — repeated-substring inventory: every 8-token span that occurs in
# MORE THAN ONE document, with its document and occurrence counts. The
# corpus-level "what text is duplicated" audit; feeds span-level
# removal. One explode + one map-side-combined groupBy on the gram —
# never doc×doc.
# ---------------------------------------------------------------------------


@register(
    "dedup_substring",
    oracle=f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents),
g AS (
    SELECT doc_id, {_shingle_sql(_SUB_N)} AS gram
    FROM tok WHERE len(s) >= {_SUB_N}
)
SELECT gram,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT)               AS n_occ,
       CAST(MIN(doc_id) AS BIGINT)            AS first_doc
FROM g
GROUP BY gram
HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY n_docs DESC, n_occ DESC, gram
LIMIT 50
""",
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    grams = docs.withColumn("_toks", F.split("text", " ")).select(
        "doc_id", F.explode(_shingles(_SUB_N, F.col("_toks"))).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("gram"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# N2s — per-document duplicated-span fraction: what share of each
# document's 8-gram spans also occur in some OTHER document. This is the
# per-doc decision signal (drop/trim docs that are mostly duplicated
# text). Document frequency comes from a window count over the distinct
# (gram, doc) pairs — no groupBy+join-back — then one aggregation per
# doc. dup_fraction divides exact integers.
# ---------------------------------------------------------------------------


@register(
    "dedup_substring_fraction",
    oracle=f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents),
g AS (
    SELECT doc_id, {_shingle_sql(_SUB_N)} AS gram
    FROM tok WHERE len(s) >= {_SUB_N}
),
per_pair AS (
    SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
    FROM g GROUP BY doc_id, gram
),
with_df AS (
    SELECT doc_id, gram, c,
           COUNT(*) OVER (PARTITION BY gram) AS n_docs
    FROM per_pair
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN n_docs > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup,
       ROUND(CAST(SUM(CASE WHEN n_docs > 1 THEN c ELSE 0 END) AS DOUBLE)
             / SUM(c), 6) AS dup_fraction
FROM with_df
GROUP BY doc_id
""",
)
def dedup_substring_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    grams = docs.withColumn("_toks", F.split("text", " ")).select(
        "doc_id", F.explode(_shingles(_SUB_N, F.col("_toks"))).alias("gram")
    )
    per_pair = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    with_df = per_pair.withColumn(
        "n_docs", F.count("*").over(Window.partitionBy("gram"))
    )
    dup_c = F.when(F.col("n_docs") > 1, F.col("c")).otherwise(F.lit(0))
    return with_df.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.sum(dup_c).alias("n_dup"),
        F.round(
            F.sum(dup_c).cast("double") / F.sum("c"), 6
        ).alias("dup_fraction"),
    )


# ---------------------------------------------------------------------------
# N4r — intra-document repetition signals (the RefinedWeb repetition
# filters): share of tokens taken by the single most frequent token,
# type/token ratio, and the share of bigram instances that repeat
# within the document. Three exact-integer ratios per doc; two
# map-side-combined explode→groupBy chains joined on doc_id.
# ---------------------------------------------------------------------------


@register(
    "text_repetition",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(STRING_SPLIT(text, ' ')) AS token FROM documents
),
tc AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
    FROM tok GROUP BY doc_id, token
),
uni AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT)   AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT)   AS top_c
    FROM tc GROUP BY doc_id
),
bg AS (
    SELECT doc_id, {_shingle_sql(2)} AS bigram
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents)
    WHERE len(s) >= 2
),
bc AS (
    SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS c
    FROM bg GROUP BY doc_id, bigram
),
bi AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_rep
    FROM bc GROUP BY doc_id
)
SELECT uni.doc_id,
       n_tokens,
       ROUND(CAST(top_c AS DOUBLE) / n_tokens, 6)      AS top_token_share,
       ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
       ROUND(CAST(n_rep AS DOUBLE) / n_bigrams, 6)     AS rep_bigram_share
FROM uni JOIN bi ON uni.doc_id = bi.doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    uni = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    bc = (
        docs.withColumn("_toks", F.split("text", " "))
        .select("doc_id", F.explode(_shingles(2, F.col("_toks"))).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    rep_c = F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
    bi = bc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.sum(rep_c).alias("n_rep")
    )
    return uni.join(bi, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("top_c").cast("double") / F.col("n_tokens"), 6).alias(
            "top_token_share"
        ),
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_tokens"), 6
        ).alias("type_token_ratio"),
        F.round(F.col("n_rep").cast("double") / F.col("n_bigrams"), 6).alias(
            "rep_bigram_share"
        ),
    )


# ---------------------------------------------------------------------------
# N6m — domain mixing weights (the DoReMi/data-mixture shape): per-source
# token mass and the resampling weight that would equalize source shares
# (uniform target; a real deployment substitutes learned targets).
# weight = total / (n_sources × source_tokens) — pure integer inputs, so
# the doubles are bit-identical across engines. Map-side-combined
# single-key aggregation + one-row broadcast; zero risk at any scale.
# ---------------------------------------------------------------------------


@register(
    "mix_source_weights",
    oracle="""
WITH src AS (
    SELECT source,
           CAST(SUM(len(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT)      AS n_sources
    FROM src
)
SELECT source, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / total, 6) AS actual_share,
       ROUND(CAST(total AS DOUBLE) / (n_sources * n_tokens), 6) AS weight
FROM src, tot
ORDER BY source
""",
)
def mix_source_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tokens")
    )
    tot = src.agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n_sources")
    )
    return (
        src.join(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("total"), 6).alias(
                "actual_share"
            ),
            F.round(
                F.col("total").cast("double")
                / (F.col("n_sources") * F.col("n_tokens")),
                6,
            ).alias("weight"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# N4b — BPE vocabulary induction, one training iteration: corpus-wide
# adjacent-symbol pair counts with every symbol an initial character.
# The counting runs at VOCAB granularity — token types and their corpus
# frequencies first (one map-side-combined shuffle over instances),
# then character pairs weighted by type frequency (a vocab-sized
# input) — which is exactly why BPE training scales: 100 TB of text
# collapses to a few million (type, count) rows before any pair work.
# The full trainer is this query in a loop with a merge-table update.
# ---------------------------------------------------------------------------


@register(
    "text_bpe_merge_pairs",
    oracle="""
WITH tok AS (
    SELECT unnest(STRING_SPLIT(text, ' ')) AS token FROM documents
),
tc AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM tok WHERE len(token) >= 2 GROUP BY token
),
ch AS (SELECT token, freq, STRING_SPLIT(token, '') AS c FROM tc),
pairs AS (
    SELECT unnest(c[1:len(c)-1]) || unnest(c[2:len(c)]) AS pair, freq
    FROM ch
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 20
""",
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") >= 2)
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.split("token", "")
    pairs = tc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(chars) - 1),
                lambda i: F.concat(
                    F.element_at(chars, i), F.element_at(chars, i + 1)
                ),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# N4s2 — Count-Min sketch frequency estimation (Cormode & Muthukrishnan
# 2005): d=4 hash rows × w=512 counters. Unlike the heavy-hitter
# sketches (Misra-Gries: only frequent items), a CMS answers point
# frequency queries for ANY key with one-sided error
# (est >= true, est <= true + eps*N w.h.p.). It is fully mergeable —
# the sketch IS a (row, col) -> count table, and merging is element-wise
# sum, i.e. exactly what a second-level groupBy does — so per-shard
# sketches roll up to corpus level without re-scanning text.
#
# The hash family is the md5 Kirsch-Mitzenmacher derivation the minhash
# block established (g_i = h1 + i*h2, pure BIGINT, bit-identical in
# DuckDB), so the ENTIRE sketch — cells and estimates — is oracle-exact,
# not just rows-only: the query emits the exact top-20 tokens with true
# count next to CMS estimate, and the one-sided-error property is
# pinned over every token in the fixture by pytest.
#
# Scale shape: one shuffle of (row, col) keys — at most d*w = 2048
# cells regardless of corpus size thanks to map-side combine — then the
# 2048-cell sketch BROADCASTS to the candidate probe. Nothing pairwise,
# nothing collected.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 512
_CMS_KM_MOD = 1 << 58
_H1 = f"{md5_long_sql('token')} % {_CMS_KM_MOD}"
_H2 = f"{md5_long_sql('token', start=16)} % {_CMS_KM_MOD}"
_H1_DUCK = f"({md5_long_duck('token')} % {_CMS_KM_MOD})"
_H2_DUCK = f"({md5_long_duck('token', start=16)} % {_CMS_KM_MOD})"


@register(
    "text_count_min",
    oracle=f"""
WITH occ AS (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
),
hk AS (SELECT token, {_H1_DUCK} AS h1, {_H2_DUCK} AS h2 FROM occ),
cells AS (
    SELECT i, (h1 + i * h2) % {_CMS_W} AS col, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM hk, (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS i)
    GROUP BY 1, 2
),
top AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n_true
    FROM occ GROUP BY token
    ORDER BY n_true DESC, token LIMIT 20
),
probe AS (SELECT token, n_true, {_H1_DUCK} AS h1, {_H2_DUCK} AS h2 FROM top)
SELECT p.token, p.n_true, MIN(c.cnt) AS cms_est
FROM probe p JOIN cells c ON c.col = (p.h1 + c.i * p.h2) % {_CMS_W}
GROUP BY p.token, p.n_true
""",
)
def text_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    occ = docs.select(F.explode(F.split("text", " ")).alias("token"))
    return cms_estimate(occ, cms_cells(occ))


def cms_cells(occ: DataFrame) -> DataFrame:
    """The mergeable sketch: (i, col) -> cnt, at most d*w rows."""
    hk = occ.selectExpr("token", f"{_H1} AS h1", f"{_H2} AS h2")
    return (
        hk.withColumn(
            "i", F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)]))
        )
        .groupBy(
            "i",
            ((F.col("h1") + F.col("i") * F.col("h2")) % _CMS_W).alias("col"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(occ: DataFrame, cells: DataFrame) -> DataFrame:
    """Point-query the exact top-20 tokens against the sketch."""
    top = (
        occ.groupBy("token")
        .agg(F.count("*").alias("n_true"))
        .orderBy(F.desc("n_true"), F.asc("token"))
        .limit(20)
    )
    probe = top.selectExpr("token", "n_true", f"{_H1} AS h1", f"{_H2} AS h2")
    return (
        probe.join(
            F.broadcast(cells),
            F.col("col") == (F.col("h1") + F.col("i") * F.col("h2")) % _CMS_W,
        )
        .groupBy("token", "n_true")
        .agg(F.min("cnt").alias("cms_est"))
    )
