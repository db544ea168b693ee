"""UDF / UDAF / UDTF surface (SURVEY.md §2.10, X1–X4).

The reference's chess functions (FEN→key, SAN parse, game→positions
explode) are compiled-in C++; our engine exposes the same extension
points as Arrow-vectorized Pandas UDFs:

- X1 scalar: `@pandas_udf` over batches (the FEN→key shape);
- X2 grouped agg: `@pandas_udf` returning one scalar per group (the
  entry-combine shape);
- X3 UDTF: `mapInPandas` — one input row → N output rows (the
  game→positions import explode, reference `Database::import`);
- X4 grouped map: `applyInPandas` — per-group normalization.

These are the SLOW path by design: everything expressible as built-ins
lives in operators/ and functions/scalar.py; this module proves the
extension surface with oracle-verified semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..tables import t


# X1 — vectorized scalar pandas UDF. (DataType objects, not DDL strings:
# string return types require an active SparkContext at decoration time.)
@pandas_udf(T.DoubleType())
def _affine(s: pd.Series) -> pd.Series:
    return s * 2.0 + 1.0


@register(
    "udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_quantity * 2.0 + 1.0 AS qty_affine
FROM lineitem
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", _affine("l_quantity").alias("qty_affine")
    )


# X2 — grouped-aggregate pandas UDF (custom combine, the reference's
# per-format entry merge function generalized).
@pandas_udf(T.DoubleType())
def _span(v: pd.Series) -> float:
    return float(v.max() - v.min())


@register(
    "udaf_grouped",
    oracle="""
SELECT l_returnflag,
       ROUND(MAX(l_extendedprice) - MIN(l_extendedprice), 2) AS price_span
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_span("l_extendedprice"), 2).alias("price_span")
    )


# X3 — UDTF via mapInPandas: one document row → one row per token
# (the game→positions explode of the import pipeline).
def _tokenize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        toks = pdf["text"].str.split(" ")
        # NULL text → NaN split result → emit no rows for that doc
        # (matching UNNEST(STRING_SPLIT(NULL, ' ')) and the built-in
        # explode path) instead of crashing the task on float repeats
        toks = toks.map(lambda v: v if isinstance(v, list) else [])
        # Vectorized expand (repeat + concatenate) — pandas .explode() is
        # an order of magnitude slower per Arrow batch.
        lens = toks.str.len().to_numpy()
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy().repeat(lens),
                "token": np.concatenate(toks.to_numpy())
                if len(toks)
                else np.array([], dtype=object),
            }
        )


@register(
    "udtf_expand",
    oracle="""
SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
FROM documents
""",
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(_tokenize_batches, schema="doc_id long, token string")


# X4 — grouped-map applyInPandas: z-score normalization per group
# (north-star embedding/feature normalization shape).
def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"]
    mean, std = v.mean(), v.std()  # ddof=1, matches STDDEV_SAMP
    out = pdf[["event_id", "event_type"]].copy()
    if std == 0 or pd.isna(std):
        # zero-variance (or single-row) group: SQL division yields
        # NULL on both engines, never inf/NaN
        out["norm_value"] = None
        return out
    z = (v - mean) / std
    # round half-AWAY-FROM-ZERO like SQL ROUND / F.round — pandas
    # Series.round is IEEE half-to-even (0.12345 -> .1234 vs SQL .1235),
    # which silently flips the correctness hash on half-ulp values
    out["norm_value"] = np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4
    return out


@register(
    "grouped_map_normalize",
    oracle="""
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS norm_value
FROM events
""",
)
def grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        _normalize, schema="event_id long, event_type string, norm_value double"
    )


# X5 — Arrow-OPTIMIZED Python UDF (Spark 3.5+/4 `useArrow=True`): the
# modern replacement for row-at-a-time F.udf — same scalar Python
# semantics, Arrow-batched transfer, no pandas dependency in the UDF
# body. The third point on the Python-boundary spectrum next to
# pandas_udf (X1) and mapInPandas (X3).
def _clamp_py(x):
    if x is None:
        # missing stays missing — without the guard max(None, 10.0)
        # raises TypeError and fails the whole task. (The oracle spells
        # this out with CASE: Postgres-style LEAST/GREATEST *ignore*
        # NULLs, so a bare LEAST(GREATEST(NULL,10),40) would clamp a
        # missing value to 10.0 instead.)
        return None
    return min(max(x, 10.0), 40.0)


@register(
    "udf_arrow_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity IS NULL THEN NULL
            ELSE LEAST(GREATEST(l_quantity, 10.0), 40.0) END AS qty_clamped
FROM lineitem
""",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    clamp = F.udf(_clamp_py, T.DoubleType(), useArrow=True)
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", clamp("l_quantity").alias("qty_clamped")
    )


# X6 — mapInArrow: the zero-copy end of the spectrum — batches arrive
# as pyarrow.RecordBatch, no pandas materialization at all. The right
# seam for codecs that already speak Arrow (vector libs, image
# decoders emitting tensors).
def _arrow_double_qty(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("l_orderkey"),
                batch.column("l_linenumber"),
                pc.multiply(batch.column("l_quantity"), pa.scalar(2.0)),
            ],
            names=["l_orderkey", "l_linenumber", "qty_doubled"],
        )


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity * 2.0 AS qty_doubled
FROM lineitem
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.mapInArrow(
        _arrow_double_qty,
        schema="l_orderkey long, l_linenumber int, qty_doubled double",
    )
