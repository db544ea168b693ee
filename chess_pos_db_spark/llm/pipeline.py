"""Training-data pipeline operators beyond the core dedup/similarity
blocks (SURVEY.md §2.11 N6+): benchmark-contamination detection,
token-stream sequence packing, n-gram LM counts, cross-source dedup,
denylist scrubbing, and the contamination-free curation composition.

Every operator is pure JVM expressions (no UDFs) and oracle-exact; the
scale arguments live next to each query. The `source = 'src0'` subset
plays the held-out evaluation set in the contamination queries — in a
real deployment that side is the benchmark corpus, typically small
enough to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hashing import md5_long_duck, md5_long_sql
from ..registry import register
from ..tables import t
from .text import _SEL_HASH, _SEL_HASH_DUCK, _SEL_RATES, _STOPWORDS

_EVAL_SOURCE = "src0"
_SHINGLE_N = 5


def _shingles(n: int, toks=None):
    """Column: array of n-token shingles (empty when the doc is shorter
    than one shingle — sequence() DESCENDS for stop<start, so the guard
    is load-bearing).

    `toks` is the token-ARRAY column to shingle. Pass a column that is
    MATERIALIZED in a prior projection (e.g. withColumn("_toks",
    split(...))): higher-order functions are interpreted (no codegen,
    no common-subexpression elimination inside the lambda), so an
    inline split() here is re-evaluated by every element_at — n
    re-splits of the full text PER SHINGLE. Measured at sf0.1
    (dedup_substring, noop sink): 8.5 s inline vs 0.93 s materialized.
    The default (None) keeps the inline form for ad-hoc callers where
    the expression is evaluated once (tests, tiny frames)."""
    if toks is None:
        toks = F.split("text", " ")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingle_sql(n: int) -> str:
    """DuckDB zipped-unnest n-gram expression over token list `s`."""
    parts = []
    for j in range(n):
        hi = "len(s)" if j == n - 1 else f"len(s)-{n - 1 - j}"
        parts.append(f"unnest(s[{j + 1}:{hi}])")
    return " || ' ' || ".join(parts)


# ---------------------------------------------------------------------------
# N6a — benchmark-contamination check: which training docs contain an
# n-gram that also appears in the held-out eval set. THE pre-training
# hygiene query (decontamination); n-gram granularity (5 here, 13 in
# common practice) trades recall vs false positives. Scale: the eval
# shingle set is benchmark-sized (≪ corpus) → broadcast; the corpus side
# is one shingle explode + semi-aggregation, never doc×doc.
# ---------------------------------------------------------------------------


@register(
    "text_contamination",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, source, STRING_SPLIT(text, ' ') AS s FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, source, {_shingle_sql(_SHINGLE_N)} AS shingle
    FROM tok WHERE len(s) >= {_SHINGLE_N}
),
eval_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE source = '{_EVAL_SOURCE}'
)
SELECT t.doc_id, CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_overlap
FROM sh t JOIN eval_sh e ON t.shingle = e.shingle
WHERE t.source <> '{_EVAL_SOURCE}'
GROUP BY t.doc_id
""",
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sh = (
        docs.withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            "source",
            F.explode(_shingles(_SHINGLE_N, F.col("_toks"))).alias("shingle"),
        )
        .distinct()
    )
    eval_sh = (
        sh.filter(F.col("source") == _EVAL_SOURCE).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("source") != _EVAL_SOURCE)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_overlap"))
    )


# ---------------------------------------------------------------------------
# N6b — token-stream sequence packing: concatenate docs (per shard, in
# deterministic order) into a token stream and slice it into fixed-
# budget training sequences; each doc reports its stream offset and the
# sequence its first token lands in. This is the document-concatenation
# packing step of LLM pre-training dataloaders, as a window cumsum —
# shard-parallel (one window group per shard), no single-partition
# stage, fully deterministic.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256
_PACK_SHARDS = 8


@register(
    "doc_pack_sequences",
    oracle=f"""
WITH d AS (
    SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok
    FROM documents
)
SELECT doc_id, shard, n_tok,
       CAST(SUM(n_tok) OVER w - n_tok AS BIGINT)  AS stream_offset,
       CAST((SUM(n_tok) OVER w - n_tok) // {_PACK_BUDGET} AS BIGINT) AS seq_id
FROM d WINDOW w AS (PARTITION BY shard ORDER BY doc_id)
""",
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    return (
        d.withColumn("stream_offset", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("seq_id", F.expr(f"stream_offset div {_PACK_BUDGET}"))
        .select("doc_id", "shard", "n_tok", "stream_offset", "seq_id")
    )


# ---------------------------------------------------------------------------
# N6c — corpus n-gram counts (bigram LM table, top-k): the classic
# count-based language-model / corpus-statistics query. One explode +
# one map-side-combined groupBy + TakeOrdered; ties broken on the
# bigram text so the top-k is deterministic.
# ---------------------------------------------------------------------------


@register(
    "text_ngram_counts",
    oracle=f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents),
grams AS (
    SELECT {_shingle_sql(2)} AS bigram FROM tok WHERE len(s) >= 2
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM grams GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 20
""",
)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    grams = docs.withColumn("_toks", F.split("text", " ")).select(
        F.explode(_shingles(2, F.col("_toks"))).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# N6d — cross-source duplicate detection: canonical-form fingerprint
# groups that span MORE THAN ONE source — the "same document crawled
# from two snapshots/mirrors" audit, which per-source dedup misses.
# The canonical form here is the sorted DISTINCT-token set (one level
# coarser than dedup_fingerprint_groups' sorted multiset): mirrors that
# reflow/repeat content keep their vocabulary, not their token counts.
# Same single map-side-combined shuffle.
# ---------------------------------------------------------------------------


def _content_fingerprint():
    """Reorder-invariant token-SET fingerprint — the one definition of
    "same content" shared by the cross-source dedup audit and the
    governance overlap matrix, so they can never silently disagree."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )


@register(
    "dedup_cross_source",
    oracle="""
WITH fp AS (
    SELECT doc_id, source,
           MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               STRING_SPLIT(text, ' '))), ' ')) AS f
    FROM documents
)
SELECT f AS fingerprint,
       CAST(MIN(doc_id) AS BIGINT)          AS keep_id,
       CAST(COUNT(*) AS BIGINT)             AS n_copies,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM fp GROUP BY f HAVING COUNT(DISTINCT source) > 1
""",
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy(_content_fingerprint().alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("n_sources") > 1)
    )


# ---------------------------------------------------------------------------
# N6e — denylist scrubbing (the PII-redaction shape): replace every
# denylisted term, report redaction counts and the digest of the
# scrubbed text (so the transform itself is oracle-checked, not just
# the counts). Map-only — at 100 TB this is a pure scan-rewrite with
# zero shuffle; a real deployment swaps the term list for PII regexes
# (emails/phones/SSNs), same plan.
# ---------------------------------------------------------------------------

_SCRUB_PATTERN = r"\b(key|hash|value)\b"
_SCRUB_TOKEN = "<X>"


@register(
    "text_pii_scrub",
    oracle=f"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '{_SCRUB_PATTERN}', 1)) AS BIGINT)
           AS n_redactions,
       MD5(regexp_replace(text, '{_SCRUB_PATTERN}', '{_SCRUB_TOKEN}', 'g'))
           AS scrubbed_digest
FROM documents
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_SCRUB_PATTERN), 1))
        .cast("bigint")
        .alias("n_redactions"),
        F.md5(F.regexp_replace("text", _SCRUB_PATTERN, _SCRUB_TOKEN)).alias(
            "scrubbed_digest"
        ),
    )


# ---------------------------------------------------------------------------
# N6f — the composed curation endpoint, contamination-aware: quality
# gate → per-language stratified sampling (select_training_docs) MINUS
# benchmark-contaminated docs (anti-join on text_contamination). The
# full pre-training selection pipeline in one declarative plan.
# ---------------------------------------------------------------------------


@register(
    "select_contamination_free",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
),
stats AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           (SUM(CASE WHEN token IN {_STOPWORDS!r} THEN 1 ELSE 0 END) * 1.0
            / COUNT(*)) AS stop_ratio
    FROM tok GROUP BY doc_id
),
tokl AS (
    SELECT doc_id, source, STRING_SPLIT(text, ' ') AS s FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, source, {_shingle_sql(_SHINGLE_N)} AS shingle
    FROM tokl WHERE len(s) >= {_SHINGLE_N}
),
eval_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE source = '{_EVAL_SOURCE}'
),
contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM sh t JOIN eval_sh e ON t.shingle = e.shingle
    WHERE t.source <> '{_EVAL_SOURCE}'
)
SELECT d.doc_id, d.lang, s.n_tokens
FROM documents d JOIN stats s ON d.doc_id = s.doc_id
WHERE s.n_tokens >= 5
  AND s.stop_ratio <= 0.5
  AND {_SEL_HASH_DUCK} < ({_SEL_RATES})
  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
""",
)
def select_contamination_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import select_training_docs

    sel = select_training_docs(spark, sf_dir)
    cont = text_contamination(spark, sf_dir).select("doc_id")
    return sel.join(cont, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# N6e — the full curation DAG as ONE Catalyst plan: exact dedup (keep
# the lowest doc_id per md5 fingerprint) ∩ quality gate ∩ per-language
# stratified sampling ∩ decontamination, then packing the survivors
# into fixed-budget training sequences. This is the whole
# raw-corpus→training-shards pipeline expressed declaratively — every
# stage is a filter/window over the same scan lineage, so Catalyst
# fuses the gates and the optimizer sees the complete data flow (no
# materialization barriers between "steps" the way a stage-per-script
# pipeline would force). Survivor packing re-shards by doc_id, so the
# cumsum window is shard-parallel — no single-partition stage.
# ---------------------------------------------------------------------------


@register(
    "curation_end_to_end",
    oracle=f"""
WITH keepers AS (
    SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY MD5(text)
                                  ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
),
tok AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
),
stats AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           (SUM(CASE WHEN token IN {_STOPWORDS!r} THEN 1 ELSE 0 END) * 1.0
            / COUNT(*)) AS stop_ratio
    FROM tok GROUP BY doc_id
),
tokl AS (
    SELECT doc_id, source, STRING_SPLIT(text, ' ') AS s FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, source, {_shingle_sql(_SHINGLE_N)} AS shingle
    FROM tokl WHERE len(s) >= {_SHINGLE_N}
),
eval_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE source = '{_EVAL_SOURCE}'
),
contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM sh t JOIN eval_sh e ON t.shingle = e.shingle
    WHERE t.source <> '{_EVAL_SOURCE}'
),
survivors AS (
    SELECT d.doc_id, d.lang, s.n_tokens
    FROM documents d
    JOIN stats s ON d.doc_id = s.doc_id
    JOIN keepers k ON d.doc_id = k.doc_id
    WHERE s.n_tokens >= 5
      AND s.stop_ratio <= 0.5
      AND {_SEL_HASH_DUCK} < ({_SEL_RATES})
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT doc_id, lang, n_tokens,
       CAST(doc_id % {_PACK_SHARDS} AS BIGINT) AS shard,
       CAST((SUM(n_tokens) OVER w - n_tokens) // {_PACK_BUDGET} AS BIGINT)
           AS seq_id
FROM survivors
WINDOW w AS (PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id)
""",
)
def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = t(spark, sf_dir, "documents")
    w_dup = W.partitionBy(F.md5("text")).orderBy("doc_id")
    keepers = (
        docs.withColumn("rn", F.row_number().over(w_dup))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    sel = select_contamination_free(spark, sf_dir)
    survivors = sel.join(keepers, "doc_id")
    return survivors.select(
        "doc_id",
        "lang",
        "n_tokens",
        (F.col("doc_id") % _PACK_SHARDS).cast("bigint").alias("shard"),
        F.expr(
            f"(sum(n_tokens) OVER (PARTITION BY doc_id % {_PACK_SHARDS}"
            f" ORDER BY doc_id) - n_tokens) div {_PACK_BUDGET}"
        ).alias("seq_id"),
    )


# ---------------------------------------------------------------------------
# N6f — per-source document cap (the CCNet/RefinedWeb "domain cap"):
# no single source may contribute more than CAP docs to the training
# mix, and the docs it does contribute are its best by a deterministic
# priority (longest first, doc_id tie-break). One window partitioned
# by source — at 100 TB the key space is the domain space (millions of
# groups), so the shuffle is fine-grained and skew-safe; a pathological
# mega-domain is exactly what the cap bounds.
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 20


@register(
    "curation_domain_cap",
    oracle=f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
           ) AS rk
    FROM documents
)
WHERE rk <= {_DOMAIN_CAP}
""",
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _DOMAIN_CAP)
        .select("doc_id", "source", "rk")
    )


# ---------------------------------------------------------------------------
# N6-split — deterministic train/val/test split: assignment is a pure
# function of doc_id (md5 bucket), so the split is reproducible from
# the id alone (no stored assignment table), stable under corpus
# append, and map-only at any scale — the same posture as sample_hash.
# 90/5/5 by hash bucket; per-(split, lang) counts summarize the result
# so the oracle checks BOTH the assignment function and the rollup.
# ---------------------------------------------------------------------------


@register(
    "split_train_val_test",
    oracle="""
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM (
    SELECT lang, n_chars,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT lang, n_chars,
               CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 100 AS bucket
        FROM documents
    )
)
GROUP BY split, lang
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# N6-card — dataset card: the per-source summary a corpus release ships
# (docs, token mass, language mix, length quantiles, dup rate). One
# pass, two shuffles: a (source, lang) partial agg and a (source)
# rollup; the exact-dup rate reuses the md5-digest groupBy shape.
# ---------------------------------------------------------------------------


@register(
    "dataset_card",
    oracle="""
WITH per_doc AS (
    SELECT source, lang, n_chars,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           MD5(text) AS digest
    FROM documents
),
dups AS (
    SELECT source, CAST(SUM(copies - 1) AS BIGINT) AS n_dup_docs
    FROM (
        SELECT source, digest, COUNT(*) AS copies
        FROM per_doc GROUP BY source, digest
    )
    GROUP BY source
)
SELECT p.source,
       CAST(COUNT(*) AS BIGINT)          AS n_docs,
       CAST(SUM(p.n_tokens) AS BIGINT)   AS n_tokens,
       CAST(COUNT(DISTINCT p.lang) AS BIGINT) AS n_langs,
       CAST(MIN(p.n_chars) AS BIGINT)    AS min_chars,
       CAST(MAX(p.n_chars) AS BIGINT)    AS max_chars,
       ROUND(AVG(p.n_chars), 4)          AS avg_chars,
       MAX(d.n_dup_docs)                 AS n_dup_docs
FROM per_doc p JOIN dups d ON d.source = p.source
GROUP BY p.source
""",
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5("text").alias("digest"),
    )
    dups = (
        per_doc.groupBy("source", "digest")
        .agg(F.count("*").alias("copies"))
        .groupBy("source")
        .agg(F.sum(F.col("copies") - 1).alias("n_dup_docs"))
    )
    card = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    return card.join(F.broadcast(dups), "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "n_langs",
        "min_chars",
        "max_chars",
        "avg_chars",
        "n_dup_docs",
    )


# ---------------------------------------------------------------------------
# N6-funnel — curation observability: the per-stage survivor counts of
# the curation DAG (raw → exact-dedup → quality gate → hash sampling →
# decontamination) in ONE pass. Every stage is expressed as a per-doc
# flag and the funnel is a single aggregate of flag sums — no stage
# materializes its survivor set, so the whole report costs the union
# of the stages' shuffles (window + stats agg + shingle semi-set),
# same as curation_end_to_end. This is the drop-accounting a corpus
# release publishes next to its dataset_card.
# ---------------------------------------------------------------------------


@register(
    "curation_funnel",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
),
stats AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           (SUM(CASE WHEN token IN {_STOPWORDS!r} THEN 1 ELSE 0 END) * 1.0
            / COUNT(*)) AS stop_ratio
    FROM tok GROUP BY doc_id
),
tokl AS (
    SELECT doc_id, source, STRING_SPLIT(text, ' ') AS s FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, source, {_shingle_sql(_SHINGLE_N)} AS shingle
    FROM tokl WHERE len(s) >= {_SHINGLE_N}
),
eval_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE source = '{_EVAL_SOURCE}'
),
contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM sh t JOIN eval_sh e ON t.shingle = e.shingle
    WHERE t.source <> '{_EVAL_SOURCE}'
),
flags AS (
    SELECT d.doc_id,
           (ROW_NUMBER() OVER (PARTITION BY MD5(d.text) ORDER BY d.doc_id) = 1)
               AS keep_dedup,
           (s.n_tokens >= 5 AND s.stop_ratio <= 0.5) AS keep_quality,
           ({_SEL_HASH_DUCK} < ({_SEL_RATES})) AS keep_sample,
           (d.doc_id NOT IN (SELECT doc_id FROM contaminated)) AS keep_clean
    FROM documents d JOIN stats s ON s.doc_id = d.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup,
       CAST(SUM(CASE WHEN keep_dedup AND keep_quality THEN 1 ELSE 0 END) AS BIGINT)
           AS n_quality,
       CAST(SUM(CASE WHEN keep_dedup AND keep_quality AND keep_sample
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN keep_dedup AND keep_quality AND keep_sample
                AND keep_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_final
FROM flags
""",
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    stats = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (
            F.sum(F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0))
            / F.count("*")
        ).alias("stop_ratio"),
    )
    # explode the shingle expression DIRECTLY (no intermediate alias):
    # exploding a materialized alias column lets InferFiltersFromGenerate
    # add a size(shs)>0 filter on the attribute, which predicate pushdown
    # then re-substitutes through the projection — re-evaluating the whole
    # shingle transform (with inline re-splits) per row at BOTH scans.
    # The rule skips non-cheap generator children, so the direct form
    # keeps the transform evaluated exactly once (measured: 10.5 s vs
    # 0.7 s for this query at sf0.1, noop).
    sh = (
        docs.withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            "source",
            F.explode(_shingles(_SHINGLE_N, F.col("_toks"))).alias("shingle"),
        )
        .distinct()
    )
    eval_sh = sh.filter(F.col("source") == _EVAL_SOURCE).select("shingle").distinct()
    contaminated = (
        sh.filter(F.col("source") != _EVAL_SOURCE)
        .join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    flags = (
        docs.join(stats, "doc_id")
        .join(
            contaminated.withColumn("is_cont", F.lit(True)), "doc_id", "left"
        )
        .select(
            "doc_id",
            (F.row_number().over(w) == 1).alias("keep_dedup"),
            ((F.col("n_tokens") >= 5) & (F.col("stop_ratio") <= 0.5)).alias(
                "keep_quality"
            ),
            F.expr(f"{_SEL_HASH} < ({_SEL_RATES})").alias("keep_sample"),
            F.coalesce(~F.col("is_cont"), F.lit(True)).alias("keep_clean"),
        )
    )
    k = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return flags.agg(
        F.count("*").alias("n_raw"),
        k(F.col("keep_dedup")).alias("n_after_dedup"),
        k(F.col("keep_dedup") & F.col("keep_quality")).alias("n_quality"),
        k(
            F.col("keep_dedup") & F.col("keep_quality") & F.col("keep_sample")
        ).alias("n_sampled"),
        k(
            F.col("keep_dedup")
            & F.col("keep_quality")
            & F.col("keep_sample")
            & F.col("keep_clean")
        ).alias("n_final"),
    )


# ---------------------------------------------------------------------------
# N6d — embedding-DIVERSITY-stratified selection (the cluster-balanced
# subset move: DataComp/SemDeDup-era curation selects training docs per
# embedding cluster instead of globally, so one dominant mode can't
# crowd out the tails). Compose the pieces the engine already proves:
# the relational IVF coarse quantizer (llm/similarity.py — K=16 cells,
# numpy argmax ≡ SQL window, oracle-exact) assigns each document's
# embedding a cell; the deterministic md5-rank quota (sample_quota
# discipline) keeps the best K_PER_CELL docs per cell.
#
# Scale shape: centroids ship in the UDF closure (K×dims floats), the
# embeddings scan is map-only into (vec_id, cell), one broadcast-able
# join to documents, one window per cell for the quota. No pairwise
# anything; the whole selection is two shuffles at 100 TB.
# ---------------------------------------------------------------------------

_DIVERSE_K_PER_CELL = 8
_DIV_HASH = md5_long_sql("cast(doc_id AS string)")
_DIV_HASH_DUCK = md5_long_duck("CAST(doc_id AS VARCHAR)")

from .similarity import _CELLS_CTE as _SIM_CELLS_CTE  # noqa: E402


@register(
    "select_diverse_docs",
    oracle=f"""
WITH {_SIM_CELLS_CTE},
ranked AS (
    SELECT d.doc_id, d.lang, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY c.cell
               ORDER BY {_DIV_HASH_DUCK}, d.doc_id
           ) AS rk
    FROM documents d JOIN cells c ON c.vec_id = d.doc_id
)
SELECT doc_id, lang, CAST(cell AS BIGINT) AS cell, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_DIVERSE_K_PER_CELL}
""",
)
def select_diverse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _cell_assignments, _ivf_centroids

    centroids, cnorms = _ivf_centroids(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    cells = _cell_assignments(emb, centroids, cnorms)
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("cell").orderBy(F.expr(_DIV_HASH), F.col("doc_id"))
    return (
        docs.join(cells, docs["doc_id"] == cells["vec_id"])
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _DIVERSE_K_PER_CELL)
        .select("doc_id", "lang", "cell", "rk")
    )


@register(
    "source_overlap_matrix",
    oracle="""
WITH fp AS (
    SELECT DISTINCT source,
           MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               STRING_SPLIT(text, ' '))), ' ')) AS fingerprint
    FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS shared_docs
FROM fp a JOIN fp b
  ON a.fingerprint = b.fingerprint AND a.source < b.source
GROUP BY a.source, b.source
""",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between sources — the corpus-governance
    matrix behind licensing/provenance review ("how much of source X
    also ships in source Y"). Content identity = the reorder-invariant
    token-set fingerprint (dedup_cross_source's), distinct per
    (source, fingerprint) so within-source copies count once.

    Scale shape: ONE fingerprint shuffle — collect_set(source) per
    digest replaces the earlier digest self-join entirely (and the
    eager localCheckpoint it needed to avoid computing the fingerprint
    scan twice: this form is fully lazy like every other registry
    operator). The per-digest source set is bounded by the source
    count, never by docs, and pair expansion is in-row. At PB scale
    the HLL twin (agg_hll_intersect per source pair over these
    fingerprints) drops even this to sketch arithmetic.
    """
    docs = t(spark, sf_dir, "documents")
    g = (
        docs.select("source", _content_fingerprint().alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    return (
        g.select(F.explode("srcs").alias("source_a"), "srcs")
        .select("source_a", F.explode("srcs").alias("source_b"))
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_docs"))
    )


# ---------------------------------------------------------------------------
# N6-delta — CDC-fed incremental curation: the ingest gate a LIVE corpus
# runs on every exported store version. The delta (one version's 'I'
# rows from plans/layout.export_changes — delta-sized by the round-10
# manifest-aware diff) passes the quality gate in-row and an exact-
# digest novelty check against the pre-append corpus, first-occurrence
# within the batch. Composes the store's CDC OUT with the curation
# family: curate only what arrived, never rescan the corpus.
#
# Scale shape: quality is zero-shuffle in-row array arithmetic on the
# delta; novelty shuffles the DELTA against a digest projection of the
# base — in production the right side is the materialized bucketed
# digest store (dedup_incremental's 16 B/doc table), so the corpus text
# is never re-read; the snapshot projection here is the oracle-matched
# form at fixture scale.
# ---------------------------------------------------------------------------


@register(
    "curation_delta_ingest",
    oracle=f"""
WITH delta AS (
    SELECT doc_id, source, text FROM documents WHERE doc_id % 4 = 3
),
base AS (
    SELECT MD5(text) AS digest FROM documents WHERE NOT (doc_id % 4 = 3)
),
scored AS (
    SELECT doc_id, source, MD5(text) AS digest,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           (LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                            x -> x IN {_STOPWORDS!r})) * 1.0
            / LEN(STRING_SPLIT(text, ' '))) AS stop_ratio
    FROM delta
),
novel AS (
    SELECT s.*, ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
    FROM scored s
    WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.digest = s.digest)
)
SELECT doc_id, source, n_tokens
FROM novel
WHERE rn = 1 AND n_tokens >= 5 AND stop_ratio <= 0.5
ORDER BY doc_id
""",
)
def curation_delta_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..plans import layout
    from ..plans.store import (
        _diff_lifecycle_build,
        _ensure_lifecycle_store,
    )

    path = _ensure_lifecycle_store(
        spark, sf_dir, "exported",
        _diff_lifecycle_build(spark, "curation_delta_ingest"),
    )
    out = os.path.join(path, "_cdc_export")
    layout.export_changes(spark, path, out, ["doc_id"])
    delta = (
        layout.read_changes(spark, out, 2)
        .filter(F.col("op") == "I")
        .select("doc_id", "source", "text")
    )
    toks = F.split("text", " ")
    scored = delta.select(
        "doc_id",
        "source",
        F.md5("text").alias("digest"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
            / F.size(toks)
        ).alias("stop_ratio"),
    )
    base = (
        layout.read_snapshot(spark, path, 1)
        .select(F.md5("text").alias("digest"))
    )
    w = Window.partitionBy("digest").orderBy("doc_id")
    return (
        scored.join(base, "digest", "left_anti")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1)
            & (F.col("n_tokens") >= 5)
            & (F.col("stop_ratio") <= 0.5)
        )
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")
    )
