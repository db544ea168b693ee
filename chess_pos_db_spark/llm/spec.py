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
  {"op": "domain_cap", "per_source": N}    — best-N per source, md5 rank
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH = (
    "cast(conv(substring(md5(cast(doc_id AS string)), 1, 15), 16, 10)"
    " AS bigint)"
)


def _normalize(df: DataFrame, stage: dict) -> DataFrame:
    return df.withColumn(
        "text",
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "),
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
    w = Window.partitionBy("source").orderBy(F.expr(_HASH), F.col("doc_id"))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(stage["per_source"]))
        .drop("__rk")
    )


_STAGES = {
    "normalize": _normalize,
    "lang_filter": _lang_filter,
    "quality_gate": _quality_gate,
    "dedup_exact": _dedup_exact,
    "sample_hash": _sample_hash,
    "domain_cap": _domain_cap,
}


def run_pipeline(docs: DataFrame, spec: dict) -> DataFrame:
    """Bind `spec["stages"]` in order over `docs`; returns the composed
    lazy plan. Unknown ops raise at bind time (config errors surface
    before any cluster time is spent)."""
    out = docs
    for stage in spec["stages"]:
        op = stage.get("op")
        if op not in _STAGES:
            raise ValueError(f"unknown pipeline stage {op!r}")
        out = _STAGES[op](out, stage)
    return out
