"""Map-only document-quality signals (N4, training-pipeline block).

The point of this module, beyond the signals themselves, is the PLAN
SHAPE: text_quality (llm/text.py) computes its ratios by
explode+groupBy — one (doc_id) shuffle of every token. These two
queries compute richer per-doc signals with ZERO shuffles: the token
and character structure is interrogated with higher-order array
functions (`filter`/`transform`/`aggregate` lambdas, JVM codegen)
entirely inside the row, so quality-scoring 100 TB is a pure scan —
parallelism = file splits, no exchange, nothing to spill.

- `text_gopher_quality`: the Gopher/MassiveText-style rule battery
  (Rae et al. 2021 §A1.1 — public paper): word count bounds, mean
  word length bounds, symbol-to-word ratio, alphabetic-word fraction,
  stopword evidence, plus the fused keep flag.
- `text_char_entropy`: character-distribution Shannon entropy — the
  compression-ratio/gibberish proxy (low entropy = repeated filler,
  high = random noise); per-row distinct-char count bounds the inner
  O(distinct × len) loop at alphabet size, so it stays scan-speed.

Both oracle-exact against DuckDB list-lambda SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t
from .text import _STOPWORDS

_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

# Gopher-style thresholds (document-filter defaults, scaled to the
# fixture's short word-soup docs: real MassiveText uses 50..100k words)
_MIN_WORDS, _MAX_WORDS = 5, 100_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MAX_SYMBOL_RATIO = 0.1
_MIN_ALPHA_FRAC = 0.8
_MIN_STOPWORDS = 0  # word-soup fixtures rarely contain real stopwords



def gopher_signals() -> dict:
    """The Gopher rule battery's signal columns over `text` — ONE
    definition shared by the registry operator (text_gopher_quality)
    and the declarative spec runner (llm/spec.py gopher_gate), so the
    two can never drift. Signals are rounded at 4dp exactly as the
    oracle computes them."""
    words = F.split("text", " ")
    n_words = F.size(words).cast("bigint")
    # '#' occurrences + '...' occurrences (each '...' removes 3 chars,
    # replaced by 2 ⇒ net 1 per occurrence — same arithmetic as the oracle)
    n_symbols = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit(""))))
        + (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("xx")))
        )
    ).cast("bigint")
    mean_word_len = F.round(
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        * F.lit(1.0)
        / n_words,
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) * F.lit(1.0) / n_words,
        4,
    )
    symbol_ratio = F.round(n_symbols * F.lit(1.0) / n_words, 4)
    stopword_hits = F.size(
        F.filter(words, lambda w: w.isin(*_STOPWORDS))
    ).cast("bigint")
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "alpha_frac": alpha_frac,
        "symbol_ratio": symbol_ratio,
        "stopword_hits": stopword_hits,
    }


def gopher_keep(sig: dict, thresholds: dict | None = None):
    """The fused keep flag over gopher signal columns; `thresholds`
    overrides any default (spec-runner form). ALL five rules apply —
    a gate that silently drops a rule admits what the registry
    operator rejects."""
    t_ = thresholds or {}
    return (
        sig["n_words"].between(
            int(t_.get("min_words", _MIN_WORDS)),
            int(t_.get("max_words", _MAX_WORDS)),
        )
        & sig["mean_word_len"].between(
            float(t_.get("min_mwl", _MIN_MWL)),
            float(t_.get("max_mwl", _MAX_MWL)),
        )
        & (
            sig["symbol_ratio"]
            <= float(t_.get("max_symbol_ratio", _MAX_SYMBOL_RATIO))
        )
        & (
            sig["alpha_frac"]
            >= float(t_.get("min_alpha_frac", _MIN_ALPHA_FRAC))
        )
        & (
            sig["stopword_hits"]
            >= int(t_.get("min_stopwords", _MIN_STOPWORDS))
        )
    )


def char_entropy_cols(chars=None) -> tuple:
    """(n_distinct_chars, char_entropy_unrounded) column expressions —
    shared by text_char_entropy and the spec runner's entropy_gate.

    `chars` is the char-ARRAY column. Pass a column materialized in a
    prior projection: the inner filter lambda references the array per
    DISTINCT char, and higher-order functions are interpreted (no CSE
    inside lambdas), so an inline split() is re-evaluated O(distinct)
    times per row — measured 7.9 s -> 2.6 s at sf0.1 (noop) for
    text_char_entropy. Default keeps the inline form for one-shot
    callers."""
    if chars is None:
        chars = F.split("text", "")
    dchars = F.array_distinct(chars)
    n = F.size(chars).cast("double")
    counts = F.transform(
        dchars, lambda d: F.size(F.filter(chars, lambda c: c == d)).cast("double")
    )
    ent = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + (c / n) * F.log2(c / n),
    )
    return F.size(dchars).cast("bigint"), ent


@register(
    "text_gopher_quality",
    oracle=f"""
WITH base AS (
    SELECT doc_id,
           string_split(text, ' ') AS words,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, '#', ''))
                + LENGTH(text) - LENGTH(REPLACE(text, '...', 'xx'))
                AS BIGINT) AS n_symbols
    FROM documents
),
m AS (
    SELECT doc_id, n_words, n_symbols,
           ROUND(list_aggregate(list_transform(words, w -> LENGTH(w)), 'sum')
                 * 1.0 / n_words, 4) AS mean_word_len,
           ROUND(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
                 * 1.0 / n_words, 4) AS alpha_frac,
           ROUND(n_symbols * 1.0 / n_words, 4) AS symbol_ratio,
           CAST(len(list_filter(words, w -> w IN ({_SW_SQL}))) AS BIGINT)
               AS stopword_hits
    FROM base
)
SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
       stopword_hits,
       (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
        AND mean_word_len BETWEEN {_MIN_MWL} AND {_MAX_MWL}
        AND symbol_ratio <= {_MAX_SYMBOL_RATIO}
        AND alpha_frac >= {_MIN_ALPHA_FRAC}
        AND stopword_hits >= {_MIN_STOPWORDS}) AS keep
FROM m
""",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery, zero-shuffle: every signal is a
    higher-order function over the in-row word array (shared column
    builders: gopher_signals/gopher_keep)."""
    docs = t(spark, sf_dir, "documents")
    sig = gopher_signals()
    out = docs.select(
        "doc_id", *[expr.alias(name) for name, expr in sig.items()]
    )
    return out.withColumn(
        "keep", gopher_keep({name: F.col(name) for name in sig})
    )


@register(
    "text_char_entropy",
    oracle="""
WITH chars AS (
    SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents
),
cnt AS (
    SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
),
tot AS (
    SELECT doc_id, SUM(c) AS n, CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM cnt GROUP BY doc_id
)
SELECT cnt.doc_id,
       MAX(tot.n_distinct) AS n_distinct_chars,
       ROUND(-SUM((c * 1.0 / n) * LOG2(c * 1.0 / n)), 4) AS char_entropy
FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
GROUP BY cnt.doc_id
""",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character Shannon entropy per doc, zero-shuffle.

    The oracle unnests+groups (relational); the Spark plan keeps the
    whole computation inside the row: distinct chars → per-char counts
    via array filters → entropy via one aggregate fold. At 100 TB this
    is a scan; the explode form would shuffle |corpus chars| rows.
    """
    from ..tables import spread_small_scan

    # the O(len x distinct) in-row lambda dwarfs the input bytes, so
    # parallelism must not be capped by the scan's split count
    # (measured 2.6 s single-task -> 0.36 s spread at sf0.1)
    docs = spread_small_scan(spark, t(spark, sf_dir, "documents"), "doc_id")
    n_distinct, ent = char_entropy_cols(F.col("_chars"))
    return docs.withColumn("_chars", F.split("text", "")).select(
        "doc_id",
        n_distinct.alias("n_distinct_chars"),
        F.round(ent, 4).alias("char_entropy"),
    )
