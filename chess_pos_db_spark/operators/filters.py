"""Filter / projection operators (SURVEY.md §2.2, P1–P8).

Reference analogues: level/result subset filters from the JSON query
request (`Query.h` levels[]/results[]), the reverse-move equality class
(continuations vs transpositions), the index-driven key-range window,
and the import parser's malformed-row rejection.

All predicates here are plain Column expressions so Catalyst pushes
them into the parquet scan (check: `PushedFilters` in
`.explain("formatted")`) — at 100 TB that is the difference between
scanning a row-group and skipping it via min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..hashing import knuth_permille_sql, md5_long_duck, md5_long_sql
from ..registry import register
from ..tables import t


# P1/P2 — low-cardinality IN-subset filters (levels[]/results[]).
@register(
    "filter_isin",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
FROM lineitem
WHERE l_returnflag IN ('A', 'R') AND l_linestatus IN ('F')
""",
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R") & F.col("l_linestatus").isin("F")
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")


# P3 — equality / inequality predicate (continuation vs transposition split
# on the packed reverse move).
@register(
    "filter_eq_neq",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
FROM lineitem
WHERE l_linestatus = 'O' AND l_returnflag <> 'A'
""",
)
def filter_eq_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_linestatus") == "O") & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")


# P4 — range predicate (sparse-index binary-search window ≈ BETWEEN on the
# clustering key; parquet row-group min/max stats give the same pruning).
@register(
    "filter_range",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_quantity BETWEEN 10 AND 20
""",
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & F.col("l_quantity").between(10, 20)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


# P5 — compound boolean predicate (AND of key/level/result/revmove
# conditions fused into the scan loop in the reference).
@register(
    "filter_compound",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_discount, l_quantity
FROM lineitem
WHERE (l_returnflag = 'N' AND l_discount > 0.05)
   OR (NOT l_linestatus = 'O' AND l_quantity < 5)
""",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "N") & (F.col("l_discount") > 0.05))
        | (~(F.col("l_linestatus") == "O") & (F.col("l_quantity") < 5))
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_discount", "l_quantity")


# P7 — malformed-row rejection: the safe-parse-then-filter-nulls pattern
# (the reference's parser skips games with illegal moves/unknown results).
# The fixtures are clean, so nulls are manufactured with NULLIF first.
@register(
    "filter_notnull",
    oracle="""
SELECT l_orderkey, l_linenumber, l_discount
FROM (
    SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS l_discount
    FROM lineitem
)
WHERE l_discount IS NOT NULL
""",
)
def filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_discount"), F.lit(0.0)).alias("l_discount"),
        )
        .filter(F.col("l_discount").isNotNull())
    )


# P8 — NULL three-valued-logic suite: coalesce, nullif, null-safe equality.
# The reference has no NULLs (fixed-width storage); a generic engine needs
# correct 3VL, so this is a north-star gap-fill.
@register(
    "null_handling",
    oracle="""
SELECT l_orderkey, l_linenumber,
       COALESCE(NULLIF(l_discount, 0.0), -1.0)              AS disc_or_flag,
       (NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM NULLIF(l_tax, 0.0))
                                                            AS disc_eq_tax_nullsafe,
       (NULLIF(l_discount, 0.0) IS NULL)                    AS disc_was_zero
FROM lineitem
""",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(disc, F.lit(-1.0)).alias("disc_or_flag"),
        disc.eqNullSafe(tax).alias("disc_eq_tax_nullsafe"),
        disc.isNull().alias("disc_was_zero"),
    )


# P6 — projection with computed columns (format payload choice ≈ column
# pruning; derived revenue column exercises expression projection).
@register(
    "project_compute",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 4)            AS revenue,
       ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
       CAST(l_quantity AS BIGINT)                               AS qty_int
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # Round at/above the data's true decimal precision (price 2dp ×
        # discount 2dp → 4dp; ×tax → 6dp): coarser rounding hits exact
        # half-way points where Spark (shortest-decimal-repr HALF_UP) and
        # DuckDB (binary-value rounding) disagree.
        F.round(rev, 4).alias("revenue"),
        F.round(rev * (1 + F.col("l_tax")), 6).alias("charged"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


# P9 — deterministic hash-mod sampling (training-data pipelines sample
# reproducibly by key hash, never by RNG: the sample must be stable
# across reruns, engines, and partitionings; it pushes down to the scan
# as a plain predicate and needs no shuffle).
@register(
    "sample_hash",
    oracle=f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE {knuth_permille_sql("o_orderkey")} < 100
""",
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Knuth multiplicative hash on the key, kept within BIGINT range so
    # the arithmetic is engine-portable (production would use xxhash64 —
    # see hash_keys_native — which DuckDB lacks).
    o = t(spark, sf_dir, "orders")
    h = F.expr(knuth_permille_sql("o_orderkey"))
    return o.filter(h < 100).select("o_orderkey", "o_custkey", "o_totalprice")


# P9b — STRATIFIED deterministic sampling: per-class rates (class-balanced
# training-data sampling — downsample the majority class, keep the rare
# one). Same hash-mod machinery as sample_hash, so it is reproducible
# across reruns/engines/partitionings, and the predicate still pushes
# toward the scan (no shuffle, no RNG). The md5-derived hash matches
# DuckDB bit-for-bit (the dedup-block family).
_STRATA_RATES = "CASE o_orderstatus WHEN 'F' THEN 50 WHEN 'O' THEN 100 ELSE 500 END"
_KEY_HASH = f"{md5_long_sql('cast(o_orderkey AS string)')} % 1000"
_KEY_HASH_DUCK = f"{md5_long_duck('CAST(o_orderkey AS VARCHAR)')} % 1000"


@register(
    "sample_stratified",
    oracle=f"""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE {_KEY_HASH_DUCK} < ({_STRATA_RATES})
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(F.expr(f"{_KEY_HASH} < ({_STRATA_RATES})")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


# P9c — fixed-QUOTA deterministic sampling: exactly K rows per stratum
# (rate-based sampling yields binomial sizes; quotas are what a
# training-mix spec demands: "exactly 200 docs per language"). The
# deterministic reservoir: rank rows within each stratum by the
# md5-derived key hash (uniform, engine-portable, reproducible across
# partitionings) and keep the first K. One window shuffle on the
# stratum key; at 100 TB the per-group sort is bounded by a pre-filter
# at ~2x the quota rate (documented scale refinement), or replaced by
# the rate sampler when approximate sizes suffice.

_QUOTA_K = 50


@register(
    "sample_quota",
    oracle=f"""
SELECT o_orderkey, o_orderstatus, CAST(rk AS BIGINT) AS rk
FROM (
    SELECT o_orderkey, o_orderstatus,
           ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY {_KEY_HASH_DUCK}, o_orderkey
           ) AS rk
    FROM orders
)
WHERE rk <= {_QUOTA_K}
""",
)
def sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.expr(_KEY_HASH), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _QUOTA_K)
        .select("o_orderkey", "o_orderstatus", "rk")
    )


# P9d — WEIGHTED sampling without replacement (Efraimidis–Spirakis
# A-ES): each row draws a uniform u and ranks by ln(u)/w — the top-K of
# that key is an exact weighted sample without replacement. Here u is
# the md5-derived engine-portable uniform (deterministic: reproducible
# across reruns, engines, partitionings — the same discipline as
# sample_hash/sample_stratified), weight = document length, so longer
# documents are proportionally more likely to be kept — the
# token-budget-aware corpus downsampling move. One TakeOrdered (top-K),
# no full sort, no shuffle before it: scan-speed at 100 TB.
_W_SAMPLE_K = 200
_W_U_SPARK = (
    f"(({md5_long_sql('cast(doc_id AS string)')} % 1000000) + 0.5) / 1000000.0"
)
_W_U_DUCK = (
    f"(({md5_long_duck('CAST(doc_id AS VARCHAR)')} % 1000000) + 0.5) / 1000000.0"
)


@register(
    "sample_weighted",
    oracle=f"""
SELECT doc_id, n_chars
FROM documents
ORDER BY LN({_W_U_DUCK}) / n_chars DESC, doc_id
LIMIT {_W_SAMPLE_K}
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    key = F.log(F.expr(_W_U_SPARK)) / F.col("n_chars")
    return (
        docs.orderBy(key.desc(), F.col("doc_id").asc())
        .select("doc_id", "n_chars")
        .limit(_W_SAMPLE_K)
    )
