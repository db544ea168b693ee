"""Text analysis operators (SURVEY.md §2.11 N4 / A11 / F14).

Token ops are pure built-ins (`split`/`explode`/`size`); nothing here
touches Python in the row path, so the same plan whole-stage-codegens
at 100 TB. The tokenizer is a literal single-space split to stay
bit-identical with the DuckDB oracle's STRING_SPLIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hashing import md5_long_duck, md5_long_sql
from ..registry import register
from ..tables import t

_STOPWORDS = ("the", "a", "of", "and")


# N4/A11 — per-language token statistics.
@register(
    "text_token_stats",
    oracle="""
WITH tok AS (
    SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT)               AS total_tokens,
       CAST(COUNT(DISTINCT token) AS BIGINT)  AS distinct_tokens,
       ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT doc_id), 4) AS avg_tokens_per_doc
FROM tok
GROUP BY lang
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    return tok.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("total_tokens"),
        F.countDistinct("token").alias("distinct_tokens"),
        F.round(F.count("*") / F.countDistinct("doc_id"), 4).alias(
            "avg_tokens_per_doc"
        ),
    )


# Quality scoring: length / token-length / stopword-ratio heuristics.
@register(
    "text_quality",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
),
stats AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(LENGTH(token)), 4) AS avg_token_len,
           ROUND(SUM(CASE WHEN token IN {_STOPWORDS!r} THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS stopword_ratio
    FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(LENGTH(d.text) AS BIGINT) AS n_chars,
       s.n_tokens, s.avg_token_len, s.stopword_ratio
FROM documents d JOIN stats s ON d.doc_id = s.doc_id
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    stats = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.length("token")), 4).alias("avg_token_len"),
        F.round(
            F.sum(F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("stopword_ratio"),
    )
    return docs.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    ).join(stats, "doc_id")


# Document fingerprint: order-insensitive content hash (md5 of the sorted
# token list) — the cheap exact-dup fingerprint that survives token
# reordering; cross-engine reproducible.
@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       MD5(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(text, ' ')), ' ')) AS fingerprint
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.split("text", " ")))).alias(
            "fingerprint"
        ),
    )


# Language-ID heuristic (n-gram/stopword scoring). The fixture's `lang`
# column is ground truth; the heuristic scores docs by stopword hit-rate.
# The score is a ratio of exact integer sums, so Spark and DuckDB divide
# to bit-identical doubles and the threshold compare is oracle-exact.
@register(
    "text_lang_id",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
)
SELECT doc_id, lang,
       (SUM(CASE WHEN token IN {_STOPWORDS} THEN 1 ELSE 0 END) * 1.0
        / COUNT(*)) > 0.02 AS looks_english
FROM tok
GROUP BY doc_id, lang
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    return tok.groupBy("doc_id", "lang").agg(
        (
            (
                F.sum(
                    F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0)
                )
                / F.count("*")
            )
            > 0.02
        ).alias("looks_english")
    )


# --- BPE-ish regex token counting (N4) ---------------------------------------

# Word / number / single-punctuation split — the GPT-2-style pretokenizer
# shape, restricted to constructs whose semantics are identical in Java
# regex (Spark) and RE2 (DuckDB).
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "text_token_count_bpe",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS BIGINT)               AS n_ws_tokens
FROM documents
""",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    pretokenizer — both pure JVM expressions (no UDF in the hot path),
    so the scan stays inside whole-stage codegen at any scale.
    """
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
    )


# --- heavy hitters: exact top-k tokens + sketched scale path -----------------


@register(
    "text_top_tokens",
    oracle="""
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
""",
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (frequent-token analysis): explode →
    count → top-k with deterministic tie-break. One shuffle (map-side
    combined); TakeOrderedAndProject merges per-partition top-k."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )


@register(
    "text_tfidf",
    oracle="""
WITH tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
          FROM documents)
    GROUP BY doc_id, token
),
df AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df
    FROM tf GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.token,
           ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
    FROM tf JOIN df USING (token), n
)
SELECT doc_id, token, tfidf
FROM (
    SELECT doc_id, token, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, token) AS rn
    FROM scored
)
WHERE rn <= 3
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (the classic keyword / quality
    feature). tf and df are two map-side-combined aggregations over the
    exploded tokens; the corpus size joins in as a broadcast one-row
    aggregate (no driver-side action); idf = ln((N+1)/(df+1)).
    Ordering happens on the ROUNDED score (round 6 on BOTH sides, then
    token tie-break) so a last-ulp libm difference between engines can
    never reorder the top-k."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    # df as a window count over the tf relation (one doc per row by
    # construction) instead of groupBy+join-back: same shuffle payload,
    # two fewer exchanges (tf-agg → token-window → doc-window).
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf")
    )


# ---------------------------------------------------------------------------
# End-to-end training-data SELECTION: the composed pipeline a data-curation
# job actually runs — quality gate (token count + stopword-ratio band) →
# per-language deterministic downsampling (majority language sampled
# hardest). Every stage reuses the primitives above, stays JVM-side, and
# the sampling hash is the cross-engine md5 recipe, so the whole
# composition is oracle-exact. At 100 TB this is two map-side-combined
# aggregations + a scan-level final filter — no extra shuffle beyond
# text_quality itself.
# ---------------------------------------------------------------------------

_SEL_RATES = "CASE lang WHEN 'en' THEN 200 ELSE 600 END"
_SEL_HASH = f"{md5_long_sql('cast(doc_id AS string)')} % 1000"
_SEL_HASH_DUCK = f"{md5_long_duck('CAST(d.doc_id AS VARCHAR)')} % 1000"


@register(
    "select_training_docs",
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
)
SELECT d.doc_id, d.lang, s.n_tokens
FROM documents d JOIN stats s ON d.doc_id = s.doc_id
WHERE s.n_tokens >= 5
  AND s.stop_ratio <= 0.5
  AND {_SEL_HASH_DUCK} < ({_SEL_RATES})
""",
)
def select_training_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    stats = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (
            F.sum(F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0))
            / F.count("*")
        ).alias("stop_ratio"),
    )
    return (
        docs.join(stats, "doc_id")
        .filter(
            (F.col("n_tokens") >= 5)
            & (F.col("stop_ratio") <= 0.5)
            & F.expr(f"{_SEL_HASH} < ({_SEL_RATES})")
        )
        .select("doc_id", "lang", "n_tokens")
    )


# ---------------------------------------------------------------------------
# N4-sketch — mergeable heavy-hitters (Misra-Gries / space-saving
# family): per-partition bounded-memory summaries + candidate recount.
# The exact text_top_tokens pays one shuffle of |vocab| (token, count)
# partial aggregates; at 100 TB vocab (counting typos/URLs) that
# exchange is the bottleneck. The sketch path shuffles AT MOST
# _MG_CAPACITY rows per partition regardless of vocab size:
#   1. per-partition Misra-Gries over the token stream (Arrow batches,
#      state carried across batches inside one mapInPandas task) —
#      classic guarantee: any token with partition frequency
#      > n_p/_MG_CAPACITY survives with count undercounted by at most
#      n_p/_MG_CAPACITY;
#   2. summaries union + groupBy(token) — the merged lower bounds keep
#      the global guarantee (freq > n/_MG_CAPACITY => token present);
#      candidates are cut by UPPER bound (lower + N/capacity) against
#      the k-th best lower bound — a cut by lower bound alone could
#      evict a true top-k token whose lower bound was decremented away;
#   3. exact recount of ONLY the candidate tokens (broadcast semi-join
#      on the scan — bounded by capacity × partitions), so reported
#      counts are exact, not estimates.
# Step 3 makes the output equal to the exact top-k whenever every true
# top-k token clears the survival bound — pinned against
# text_top_tokens in tests; registered rows-only because the sketch
# isn't SQL-expressible.
# ---------------------------------------------------------------------------

_MG_CAPACITY = 256
_MG_TOP_K = 20


def _misra_gries_summaries(tokens: DataFrame) -> DataFrame:
    """(token, cnt_lower) per input partition, ≤ _MG_CAPACITY rows each."""
    import pandas as pd

    cap = _MG_CAPACITY

    def mg(batches):
        counts: dict[str, int] = {}
        n_seen = 0
        for pdf in batches:
            n_seen += len(pdf)
            for tok in pdf["token"]:
                if tok in counts:
                    counts[tok] += 1
                elif len(counts) < cap:
                    counts[tok] = 1
                else:
                    # decrement-all step, dropping zeroed entries
                    dead = []
                    for k in counts:
                        counts[k] -= 1
                        if counts[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counts[k]
        if n_seen:
            # NULL-token sentinel carries the partition's total token
            # count — split(" ") tokens are never NULL, so the channel
            # is unambiguous. Consumers need N to form UPPER bounds
            # (true freq <= merged lower bound + N/capacity).
            yield pd.DataFrame(
                {
                    "token": list(counts) + [None],
                    "cnt_lower": list(counts.values()) + [n_seen],
                }
            )

    return tokens.mapInPandas(mg, "token string, cnt_lower long")


@register(
    "text_heavy_hitters_sketch",
    # The SKETCH isn't SQL, but its exact-recount tail makes the final
    # top-20 equal to the exact answer whenever the Misra-Gries
    # candidate margin holds (guaranteed for counts > N/capacity;
    # pinned against the exact path in tests/test_mining.py) — so the
    # exact top-20 IS the oracle.
    oracle="""
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
""",
)
def text_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    summaries = _misra_gries_summaries(tokens).localCheckpoint(eager=True)
    merged = summaries.where(F.col("token").isNotNull()).groupBy("token").agg(
        F.sum("cnt_lower").alias("bound")
    )
    # Sound candidate cut: a fixed top-by-LOWER-bound cut can evict a
    # true top-k token (MG undercounts by up to N/capacity, so a heavy
    # token can carry a tiny lower bound while many mid-weight tokens
    # out-rank it). Keep every token whose UPPER bound (lower + N/cap,
    # the classic merged-MG guarantee) reaches the k-th best lower
    # bound — no true top-k member can fall below that line, because
    # its true count >= the k-th token's true count >= that token's
    # lower bound.
    n_total = summaries.where(F.col("token").isNull()).agg(
        F.sum("cnt_lower")
    ).collect()[0][0]
    kth_rows = (
        merged.orderBy(F.desc("bound")).limit(_MG_TOP_K).collect()
    )  # bounded: k rows
    kth_bound = kth_rows[-1]["bound"] if len(kth_rows) == _MG_TOP_K else 0
    slack = (n_total or 0) // _MG_CAPACITY
    candidates = merged.where(
        F.col("bound") + F.lit(slack) >= F.lit(kth_bound)
    ).select("token")
    exact_on_candidates = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return exact_on_candidates.orderBy(
        F.desc("cnt"), F.asc("token")
    ).limit(_MG_TOP_K)


# ---------------------------------------------------------------------------
# N4-bpe-train — ITERATIVE BPE vocabulary training (the full loop;
# text_bpe_merge_pairs is one iteration of this). Standard algorithm
# at vocab granularity (Sennrich et al., ACL'16): word-TYPE frequencies
# are the weights, so each round touches |vocab| rows, not the corpus —
# after the initial token count, training cost is corpus-size-
# independent (the 100 TB property). Each round is:
#   adjacent-pair counts (weighted) → argmax (deterministic tie-break:
#   highest freq, then lexicographic) → merge applied to every word's
#   symbol array as a JVM-side fold (no UDF) → localCheckpoint.
# The merge fold uses '' as the no-pending sentinel (symbols are never
# empty), reproducing greedy left-to-right merging exactly — "a a a"
# under rule (a,a) becomes ["aa","a"], matching the reference
# implementation pinned in tests (pure-python BPE on the same fixture).
# Registered rows-only: 8 data-dependent argmax rounds aren't SQL.
# ---------------------------------------------------------------------------

_BPE_MERGES = 8


def _adjacent_pairs(sym_col):
    """array<struct<l,r>> of adjacent symbol pairs (empty for len<2)."""
    return F.when(
        F.size(sym_col) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(sym_col) - 2),
            lambda i: F.struct(
                F.element_at(sym_col, i + 1).alias("l"),
                F.element_at(sym_col, i + 2).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_fold(sym_col, left: str, right: str):
    """Fold replacing every adjacent (left, right) with left||right,
    greedy left-to-right."""
    merged = F.lit(left + right)
    step = lambda acc, s: F.when(  # noqa: E731
        (acc["pend"] == F.lit(left)) & (s == F.lit(right)),
        F.struct(
            F.concat(acc["out"], F.array(merged)).alias("out"),
            F.lit("").alias("pend"),
        ),
    ).otherwise(
        F.struct(
            F.when(
                acc["pend"] == F.lit(""), acc["out"]
            ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))).alias("out"),
            s.alias("pend"),
        )
    )
    folded = F.aggregate(
        sym_col,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("pend"),
        ),
        step,
    )
    return F.when(
        folded["pend"] == F.lit(""), folded["out"]
    ).otherwise(F.concat(folded["out"], F.array(folded["pend"])))


def bpe_train(spark: SparkSession, sf_dir: str, n_merges: int = _BPE_MERGES):
    """Learned merge table [(step, left, right, freq)] plus the final
    per-word symbolization DataFrame (word, cnt, syms)."""
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.split(F.col("word"), "(?!$)").alias("syms"),
        )
        .localCheckpoint()
    )
    merges = []
    for step_i in range(n_merges):
        top = (
            words.select(
                "cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0]["l"], top[0]["r"], top[0]["freq"]
        merges.append((step_i, left, right, freq))
        prev = words
        words = words.select(
            "word", "cnt", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
        # the new checkpoint no longer depends on the old one — drop it
        # or every merge round pins another full vocab copy in executor
        # storage for the session lifetime
        prev.unpersist()
    return merges, words


@register("text_bpe_train")  # rows-only: iterative argmax isn't SQL
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, left string, right string, freq long"
    )


@register("text_bpe_apply")  # rows-only: consumes the trained merges
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the trained merges: per-doc BPE piece
    count. The symbolization already exists at vocab granularity from
    training, so application is one broadcast join of the (small) vocab
    to the exploded corpus + a doc rollup — the corpus is never
    re-folded."""
    _, words = bpe_train(spark, sf_dir)
    vocab = words.select(
        "word", F.size("syms").alias("n_pieces_word")
    )
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return (
        toks.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_pieces_word").alias("n_pieces"))
    )


# ---------------------------------------------------------------------------
# N4-norm — text normalization: the first stage of every curation DAG
# (lowercase → strip non-alphanumerics → collapse whitespace → trim).
# Map-only, zero shuffles, fully codegen-fused; oracle-exact (DuckDB
# regexp_replace needs the 'g' flag for replace-all, Spark replaces all
# by default).
# ---------------------------------------------------------------------------


@register(
    "text_normalize",
    oracle="""
SELECT doc_id,
       TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS norm_text,
       CAST(LEN(STRING_SPLIT(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT)
           AS n_tokens_norm
FROM documents
""",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).cast("long").alias("n_tokens_norm"),
    )


# ---------------------------------------------------------------------------
# N4-model — model-based quality scoring: a fixed-weight logistic
# classifier over cheap text features (the fastText-quality-filter
# stand-in — weights would come from offline training; scoring at
# corpus scale is what the engine owns). Pure JVM arithmetic, map-only
# over per-doc aggregates of the token stream: one (doc_id) shuffle for
# the token features, everything else fused.
# ---------------------------------------------------------------------------

_QM_W = {
    "bias": -1.2,
    "log_tokens": 0.35,
    "ttr": 2.1,  # type/token ratio
    "avg_len": 0.12,  # average token length
}


@register(
    "text_quality_model",
    oracle=f"""
WITH feats AS (
    SELECT doc_id,
           LN(COUNT(*)) AS log_tokens,
           COUNT(DISTINCT token) * 1.0 / COUNT(*) AS ttr,
           AVG(LEN(token)) AS avg_len
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
          FROM documents)
    GROUP BY doc_id
)
SELECT doc_id, quality, (quality >= 0.5) AS keep
FROM (
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-({_QM_W['bias']} + {_QM_W['log_tokens']} * log_tokens
                 + {_QM_W['ttr']} * ttr + {_QM_W['avg_len']} * avg_len))), 6) AS quality
    FROM feats
)
""",
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    feats = toks.groupBy("doc_id").agg(
        F.log(F.count("*")).alias("log_tokens"),
        (F.countDistinct("token") / F.count("*")).alias("ttr"),
        F.avg(F.length("token")).alias("avg_len"),
    )
    z = (
        F.lit(_QM_W["bias"])
        + _QM_W["log_tokens"] * F.col("log_tokens")
        + _QM_W["ttr"] * F.col("ttr")
        + _QM_W["avg_len"] * F.col("avg_len")
    )
    # keep thresholds the ROUNDED score (both engines): LN/EXP are
    # libm-dependent, so a raw score straddling 0.5 within an ulp
    # could flip keep across engines — the same cross-engine
    # discipline the tfidf/bm25 orderings follow.
    score = F.round(1.0 / (1.0 + F.exp(-z)), 6)
    return feats.select(
        "doc_id",
        score.alias("quality"),
        (score >= 0.5).alias("keep"),
    )


# ---------------------------------------------------------------------------
# N4-sg — skip-gram co-occurrence counts (window ±2): the
# word2vec/GloVe training-pair extraction. Pair generation is MAP-ONLY
# nested array transforms (no token-position self-join — the join form
# shuffles the whole token stream twice and is quadratic per repeated
# token); the only exchange is the (center, context) partial-agg
# count. The oracle uses the equivalent positions self-join, which
# DuckDB can afford at fixture scale — same result, different plan,
# which is exactly the point.
# ---------------------------------------------------------------------------

_SG_WINDOW = 2
_SG_TOP_K = 20


@register(
    "text_skipgram_pairs",
    oracle=f"""
WITH base AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
),
tok0 AS (
    SELECT doc_id,
           UNNEST(LIST_TRANSFORM(RANGE(1, ARRAY_LENGTH(toks) + 1),
               i -> STRUCT_PACK(pos := i, tok := toks[i]))) AS p
    FROM base
),
tok AS (SELECT doc_id, p.pos AS pos, p.tok AS tok FROM tok0),
pairs AS (
    SELECT a.tok AS center, b.tok AS context
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id
     AND ABS(a.pos - b.pos) <= {_SG_WINDOW}
     AND a.pos <> b.pos
)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs
GROUP BY center, context
ORDER BY n DESC, center, context
LIMIT {_SG_TOP_K}
""",
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The pair multiset {(tok[i], tok[j]) : |i-j| <= W, i != j} is built
    # as 2W shifted zips — for each offset d in 1..W, zip the array with
    # itself shifted by d gives the forward pairs and their transposes
    # give the backward ones. Same multiset as the per-position
    # nested-window form, but with single-level lambdas over a
    # MATERIALIZED token column: HOFs are interpreted (no codegen, no
    # CSE inside lambdas), so the previous nested transform re-split the
    # text per pair slot — measured 14.4 s -> ~1 s at sf0.1 (noop).
    docs = t(spark, sf_dir, "documents")
    toks = F.col("_toks")
    n = F.size(toks)
    shifted = []
    for d in range(1, _SG_WINDOW + 1):
        fwd = F.zip_with(
            F.slice(toks, 1, F.greatest(n - d, F.lit(0))),
            F.slice(toks, d + 1, F.greatest(n - d, F.lit(0))),
            lambda a, b: F.struct(a.alias("center"), b.alias("context")),
        )
        bwd = F.zip_with(
            F.slice(toks, d + 1, F.greatest(n - d, F.lit(0))),
            F.slice(toks, 1, F.greatest(n - d, F.lit(0))),
            lambda a, b: F.struct(a.alias("center"), b.alias("context")),
        )
        shifted.extend([fwd, bwd])
    pairs = F.concat(*shifted)
    return (
        docs.withColumn("_toks", F.split("text", " "))
        .select(F.explode(pairs).alias("p"))
        .select("p.center", "p.context")
        .groupBy("center", "context")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "center", "context")
        .limit(_SG_TOP_K)
    )


@register(
    "lang_id_eval",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
),
pred AS (
    SELECT doc_id, lang,
           (SUM(CASE WHEN token IN {_STOPWORDS} THEN 1 ELSE 0 END) * 1.0
            / COUNT(*)) > 0.02 AS looks_english
    FROM tok GROUP BY doc_id, lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN looks_english THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
       ROUND(SUM(CASE WHEN looks_english THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 4) AS flag_rate
FROM pred GROUP BY lang
""",
)
def lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation rollup for the lang-ID heuristic: per TRUE
    language, how often the looks-english detector fires — the
    confusion/flag-rate report every heuristic filter ships with (at
    100 TB this is how you notice the detector eating a language).
    One extra (lang) rollup on top of the per-doc prediction —
    evaluation rides the same shuffle family as the classifier."""
    pred = text_lang_id(spark, sf_dir)
    return pred.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("looks_english"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.round(
            F.sum(F.when(F.col("looks_english"), 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("flag_rate"),
    )
