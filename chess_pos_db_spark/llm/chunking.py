"""Document chunking and containment detection for the training/RAG
pipeline (SURVEY.md §2.11 N-block extensions).

- ``text_chunk_overlap``: the retrieval-prep chunker — every document
  split into fixed-size token windows with overlapping stride, ordinal
  chunk ids preserved. Entirely map-only (split → sequence → slice →
  posexplode): zero shuffles, so at 100 TB it runs at scan speed and
  parallelism is whatever the file split gives. This is the operator
  that feeds the embedding stage of a RAG index build.

- ``dedup_containment``: ASYMMETRIC near-dup detection — containment
  C(A→B) = |rare(A) ∩ rare(B)| / |tokens(A)|, the measure that
  catches "A is quoted inside B" where symmetric Jaccard stays low
  because B is much larger. The intersection runs over df-capped
  token postings (the cap bounds the self-join quadratically on
  stopwords, same machinery as dedup_jaccard) while the denominator
  is the doc's FULL distinct vocabulary, so the value is a safe lower
  bound on true containment. Emits DIRECTED pairs.

Both are oracle-exact: the chunker's window arithmetic is integer, and
containment divides exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import t
from .dedup import JACCARD_DF_CAP

CHUNK_TOKENS = 32  # chunk size C (tokens) — fixture-scale stand-in for
# the ~512-token chunks a real RAG index uses; the plan is identical
CHUNK_STRIDE = 24  # stride S < C → C - S = 8 tokens of overlap


@register(
    "text_chunk_overlap",
    oracle=f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS s FROM documents
             WHERE text IS NOT NULL),
st AS (
    SELECT doc_id, s,
           CAST(UNNEST(generate_series(
               1, GREATEST(len(s) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
               {CHUNK_STRIDE})) AS BIGINT) AS i
    FROM tok
)
SELECT doc_id,
       (i - 1) // {CHUNK_STRIDE} AS chunk_id,
       CAST(len(s[i : i + {CHUNK_TOKENS - 1}]) AS BIGINT) AS chunk_tokens,
       ARRAY_TO_STRING(s[i : i + {CHUNK_TOKENS - 1}], ' ') AS chunk_text
FROM st
""",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_docs(t(spark, sf_dir, "documents"))


def chunk_docs(
    docs: DataFrame, C: int = CHUNK_TOKENS, S: int = CHUNK_STRIDE
) -> DataFrame:
    """Sliding-window chunker: starts at 1, 1+S, 1+2S, ... up to
    n - (C - S), so the last chunk always reaches the end of the
    document and no chunk is fully contained in its predecessor.
    Short docs (n <= C) produce exactly one chunk. NULL-text docs
    produce NO chunks — without the filter, F.greatest skips the NULL
    size and resurrects start=1, emitting a phantom empty chunk whose
    chunk_text ('' via concat_ws) diverges from SQL NULL semantics."""
    toks = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("s")
    )
    starts = F.sequence(
        F.lit(1).cast("long"),
        F.greatest(F.size("s") - F.lit(C - S), F.lit(1)).cast("long"),
        F.lit(S).cast("long"),
    )
    return toks.select(
        "doc_id",
        F.posexplode(F.transform(starts, lambda i: F.slice("s", i, C))).alias(
            "pos", "chunk"
        ),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("chunk_id"),
        F.size("chunk").cast("long").alias("chunk_tokens"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
    )


_CONTAIN_T = 0.8  # directed containment threshold


@register(
    "dedup_containment",
    oracle=f"""
WITH tok0 AS (
    SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
),
tok AS (
    SELECT doc_id, token FROM (
        SELECT doc_id, token, COUNT(*) OVER (PARTITION BY token) AS df
        FROM tok0
    ) WHERE df <= {JACCARD_DF_CAP}
),
sizes AS (
    -- denominator = the doc's FULL distinct vocabulary (uncapped):
    -- dividing by the capped set would inflate C(A->B) for docs
    -- dominated by common tokens (46/50 capped away -> 4 survivors
    -- shared => containment 1.0, a false inclusion verdict)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok0 GROUP BY doc_id
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id <> b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       ROUND(p.n_shared * 1.0 / sa.n_tok, 4) AS containment
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
WHERE p.n_shared * 1.0 / sa.n_tok >= {_CONTAIN_T}
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return containment_pairs(t(spark, sf_dir, "documents"))


def containment_pairs(
    docs: DataFrame, cap: int = JACCARD_DF_CAP, threshold: float = _CONTAIN_T
) -> DataFrame:
    """Directed containment over df-capped postings. The window-count
    df filter reuses the token hash-partitioning the self-join needs
    (the dedup_jaccard plan); the size lookup broadcast-joins (one
    row per doc). C(A→B) >= t with |B| >> |A| is the quote/inclusion
    case symmetric Jaccard misses.

    The cap applies to the INTERSECTION only; the denominator is the
    doc's full distinct vocabulary. A capped denominator would make
    the ratio |rare(A) ∩ rare(B)| / |rare(A)| — for a doc whose
    vocabulary is mostly common tokens, a handful of shared rare
    tokens then reads as full containment. With the full denominator
    the reported value is a LOWER bound on true containment (shared
    common tokens aren't counted — by design: they carry no quotation
    evidence), and it degrades safely as df distributions grow."""
    tok0 = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        # three consumers (df-capped postings + uncapped size rollup) —
        # same materialize-once move as dedup_jaccard
        .localCheckpoint(eager=True)
    )
    tok = (
        tok0.withColumn("df", F.count("*").over(Window.partitionBy("token")))
        .filter(F.col("df") <= cap)
        .drop("df")
        .localCheckpoint(eager=True)  # two self-join sides
    )
    sizes = tok0.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    cont = F.col("n_shared") / F.col("sa.n_tok")
    return (
        pairs.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .filter(cont >= threshold)
        .select("doc_a", "doc_b", F.round(cont, 4).alias("containment"))
    )
