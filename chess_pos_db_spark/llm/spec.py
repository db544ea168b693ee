"""Declarative curation-pipeline runner: a platform-facing config →
one composed Catalyst plan. A training-data team writes the WHAT
(stages + thresholds, a dict that can live in JSON next to the
dataset card); this module binds each stage to the engine's proven
expressions and returns ONE lazy DataFrame — no stage materializes, so
Catalyst sees the whole funnel and pushes filters ahead of the
expensive stages exactly as the hand-written curation_end_to_end plan
does.

Stage vocabulary (each maps to an operator the registry already
oracle-verifies individually):

  {"op": "normalize"}                      — lowercase/trim/collapse ws
  {"op": "lang_filter", "langs": [...]}    — keep listed languages
  {"op": "quality_gate", "min_tokens": N, "max_mean_len": X}
  {"op": "dedup_exact"}                    — first doc per content digest
  {"op": "sample_hash", "permille": N}     — deterministic hash-mod rate
  {"op": "domain_cap", "per_source": N}    — longest-N per source
  {"op": "gopher_gate", ...}               — Gopher rule battery (map-only,
        thresholds override llm/quality.py defaults)
  {"op": "entropy_gate", "min_entropy": X} — char-entropy floor (gibberish
        and filler collapse to low entropy; map-only)
  {"op": "exclude_ids", "doc_ids": [...] | "path": dir}
        — retraction denylist (the lazy half of llm/retraction.py:
        training runs exclude retracted docs immediately, before the
        stores' physical deletes converge)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..hashing import md5_long_sql

_HASH = md5_long_sql("cast(doc_id AS string)")


def _normalize(df: DataFrame, stage: dict) -> DataFrame:
    # trim AFTER the \s+ collapse (text_normalize's order): F.trim
    # strips only spaces, so trimming first leaves a residual edge
    # space when the text starts/ends with a tab or newline — two docs
    # identical up to edge whitespace would then fingerprint apart and
    # survive the dedup_exact stage as duplicates.
    return df.withColumn(
        "text",
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")),
    )


def _lang_filter(df: DataFrame, stage: dict) -> DataFrame:
    return df.filter(F.col("lang").isin(list(stage["langs"])))


def _quality_gate(df: DataFrame, stage: dict) -> DataFrame:
    toks = F.split("text", " ")
    out = df
    if "min_tokens" in stage:
        out = out.filter(F.size(toks) >= int(stage["min_tokens"]))
    if "max_mean_len" in stage:
        out = out.filter(
            (F.length("text") / F.size(toks)) <= float(stage["max_mean_len"])
        )
    return out


def _dedup_exact(df: DataFrame, stage: dict) -> DataFrame:
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _sample_hash(df: DataFrame, stage: dict) -> DataFrame:
    return df.filter(
        F.expr(_HASH) % 1000 < int(stage["permille"])
    )


def _domain_cap(df: DataFrame, stage: dict) -> DataFrame:
    # best-N = LONGEST-first, the same deterministic priority the
    # oracle-verified curation_domain_cap operator uses (n_chars DESC,
    # doc_id) — an md5 rank here would silently keep N hash-random
    # docs per source instead of the N best. n_chars is derived from
    # the (possibly normalized) text so the stage works mid-pipeline.
    w = Window.partitionBy("source").orderBy(
        F.length("text").desc(), F.col("doc_id")
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(stage["per_source"]))
        .drop("__rk")
    )


def _gopher_gate(df: DataFrame, stage: dict) -> DataFrame:
    # The SAME signal/keep builders the registry operator uses —
    # including the symbol-ratio and stopword rules an earlier inline
    # copy silently dropped (the gate admitted symbol spam the
    # oracle-verified operator rejects).
    from .quality import gopher_keep, gopher_signals

    return df.filter(gopher_keep(gopher_signals(), stage))


def _entropy_gate(df: DataFrame, stage: dict) -> DataFrame:
    from .quality import char_entropy_cols

    _, ent = char_entropy_cols(F.col("_chars"))
    # The working column is injected and dropped here; a pre-existing
    # user column of the same name would be silently clobbered AND
    # removed — surface that as a config error instead (same discipline
    # as the stage-key validation below).
    if "_chars" in df.columns:
        raise ValueError(
            "entropy_gate: input frame already has a '_chars' column "
            "(reserved as this stage's working column)"
        )
    # threshold the 4dp-ROUNDED entropy, exactly as the oracle-verified
    # text_char_entropy reports it — gating the raw value would drop a
    # boundary doc the published operator keeps. The char array is
    # materialized first (char_entropy_cols docstring: interpreted HOFs
    # re-evaluate an inline split per distinct char).
    return (
        df.withColumn("_chars", F.split("text", ""))
        .filter(F.round(ent, 4) >= float(stage["min_entropy"]))
        .drop("_chars")
    )


def _exclude_ids(df: DataFrame, stage: dict) -> DataFrame:
    # The LAZY half of the retraction story (llm/retraction.py is the
    # physical half): a training run must exclude retracted doc_ids
    # IMMEDIATELY, even before the stores' deletes/vacuums converge.
    # Inline "doc_ids" for a config-sized denylist (broadcast IN-list);
    # "path" for the production shape — a parquet of doc_ids anti-joined
    # in (broadcast by AQE at denylist scale, never corpus-shuffling
    # the fact side).
    if "doc_ids" in stage and "path" in stage:
        raise ValueError(
            "exclude_ids: pass EITHER an inline doc_ids list OR a path "
            "to a doc_id parquet, not both (ambiguous denylist source)"
        )
    if "doc_ids" in stage:
        return df.filter(~F.col("doc_id").isin(list(stage["doc_ids"])))
    ids = df.sparkSession.read.parquet(stage["path"]).select("doc_id")
    return df.join(ids, "doc_id", "left_anti")


_STAGES = {
    "normalize": _normalize,
    "lang_filter": _lang_filter,
    "quality_gate": _quality_gate,
    "dedup_exact": _dedup_exact,
    "sample_hash": _sample_hash,
    "domain_cap": _domain_cap,
    "gopher_gate": _gopher_gate,
    "entropy_gate": _entropy_gate,
    "exclude_ids": _exclude_ids,
}

# Allowed parameter keys per stage: a misspelled threshold (min_token
# for min_tokens) or an unsupported one would otherwise bind cleanly
# and silently DISABLE the gate — the opposite of "config errors
# surface before any cluster time is spent".
_STAGE_KEYS = {
    "normalize": set(),
    "lang_filter": {"langs"},
    "quality_gate": {"min_tokens", "max_mean_len"},
    "dedup_exact": set(),
    "sample_hash": {"permille"},
    "domain_cap": {"per_source"},
    "gopher_gate": {
        "min_words",
        "max_words",
        "min_mwl",
        "max_mwl",
        "max_symbol_ratio",
        "min_alpha_frac",
        "min_stopwords",
    },
    "entropy_gate": {"min_entropy"},
    "exclude_ids": {"doc_ids", "path"},
}

# Keys a stage cannot function without: their absence is the same
# silent-disable (or bare-KeyError) class the unknown-key check exists
# to prevent. quality_gate must carry at least one threshold — an
# empty one filters nothing, which is never what a config author
# meant. (An empty gopher_gate IS meaningful: quality.gopher_keep
# applies the full default rule battery.)
_STAGE_REQUIRED = {
    "lang_filter": {"langs"},
    "sample_hash": {"permille"},
    "domain_cap": {"per_source"},
    "entropy_gate": {"min_entropy"},
}
_STAGE_AT_LEAST_ONE = {"quality_gate", "exclude_ids"}


def _check_values(op: str, stage: dict) -> None:
    """Degenerate-value validation: these values bind cleanly and then
    silently produce an EMPTY (or unfiltered) corpus — the worst config
    failure mode, because the job succeeds and ships nothing/everything.
    Same discipline as the unknown-key check: surface it at bind time.
    (An explicitly empty exclude_ids denylist is NOT here — excluding
    nothing is the correct reading of an empty retraction list.)"""
    if op == "lang_filter" and not list(stage["langs"]):
        raise ValueError(
            "lang_filter: empty langs list would silently drop EVERY "
            "document — list the languages to keep"
        )
    if op == "sample_hash":
        p = int(stage["permille"])
        if not (0 < p <= 1000):
            raise ValueError(
                f"sample_hash: permille={p} out of range — must be in "
                "(0, 1000] (0 keeps nothing, >1000 is a rate typo: the "
                "unit is per-mille, not per-cent or a count)"
            )
    if op == "domain_cap" and int(stage["per_source"]) < 1:
        raise ValueError(
            f"domain_cap: per_source={stage['per_source']} keeps "
            "nothing — must be >= 1"
        )


def run_pipeline(docs: DataFrame, spec: dict, observe: bool = False):
    """Bind `spec["stages"]` in order over `docs`; returns the composed
    lazy plan. Unknown ops raise at bind time (config errors surface
    before any cluster time is spent).

    With observe=True, returns (df, observations): an `Observation`
    row count at the input and after every stage. These piggyback on
    the SAME execution (accumulator-style, no extra pass and no plan
    barrier — Catalyst still fuses across stage boundaries), so the
    per-stage survivor funnel costs nothing beyond the job the caller
    was already running — the execution-time twin of the
    curation_funnel query. Read `obs.get` after any action on the
    returned plan."""
    from pyspark.sql import Observation

    out = docs
    observations: dict[str, "Observation"] = {}

    def tap(df: DataFrame, name: str) -> DataFrame:
        if not observe:
            return df
        ob = Observation(name)
        observations[name] = ob
        return df.observe(ob, F.count(F.lit(1)).alias("rows"))

    out = tap(out, "input")
    for i, stage in enumerate(spec["stages"]):
        op = stage.get("op")
        if op not in _STAGES:
            raise ValueError(f"unknown pipeline stage {op!r}")
        extra = set(stage) - {"op"} - _STAGE_KEYS[op]
        if extra:
            raise ValueError(
                f"unknown parameter(s) {sorted(extra)} for pipeline "
                f"stage {op!r} (allowed: {sorted(_STAGE_KEYS[op])})"
            )
        missing = _STAGE_REQUIRED.get(op, set()) - set(stage)
        if missing:
            raise ValueError(
                f"missing required parameter(s) {sorted(missing)} for "
                f"pipeline stage {op!r}"
            )
        if op in _STAGE_AT_LEAST_ONE and not (set(stage) - {"op"}):
            raise ValueError(
                f"pipeline stage {op!r} has no thresholds — an empty "
                f"gate filters nothing; set at least one of "
                f"{sorted(_STAGE_KEYS[op])}"
            )
        _check_values(op, stage)
        out = tap(_STAGES[op](out, stage), f"{i}:{op}")
    if observe:
        return out, observations
    return out
