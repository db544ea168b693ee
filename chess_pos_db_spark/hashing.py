"""The cross-engine md5 hash recipe, in ONE place.

Every deterministic-sampling and Kirsch-Mitzenmacher double-hash
operator (minhash, simhash, count-min, sample_*, split/selection
buckets, incremental-dedup store buckets) derives integers from
`md5(expr)` with an expression that must produce the SAME value in
Spark SQL and in the DuckDB oracle — substr offsets, radix casts, and
sign behavior all have to line up across two dialects. Hand-copying
the pair at each site is how parity drifts one transcription slip at a
time; these two builders are the single source of the recipe.

Both take `length <= 15` hex chars (60 bits), so the result always
fits a signed BIGINT non-negatively on both engines.
"""

from __future__ import annotations


def md5_long_sql(expr: str, start: int = 1, length: int = 15) -> str:
    """Spark SQL: `length` hex chars of md5(`expr`) starting at
    1-based `start`, as a non-negative BIGINT."""
    assert 1 <= length <= 15, "more than 15 hex chars overflows BIGINT"
    return (
        f"cast(conv(substring(md5({expr}), {start}, {length}), 16, 10)"
        " AS bigint)"
    )


def md5_long_duck(expr: str, start: int = 1, length: int = 15) -> str:
    """DuckDB twin of :func:`md5_long_sql` — identical value by
    construction (hex-literal cast instead of conv)."""
    assert 1 <= length <= 15, "more than 15 hex chars overflows BIGINT"
    return f"(('0x' || substr(MD5({expr}), {start}, {length}))::BIGINT)"


def knuth_permille_sql(key_expr: str) -> str:
    """Deterministic permille bucket of an integer key — the Knuth
    multiplicative hash-mod predicate behind sample_hash (P9) and the
    AQP estimators built on it. One definition, valid verbatim in BOTH
    Spark SQL and DuckDB (plain BIGINT arithmetic), so the AQP sample
    can never silently de-synchronize from the sampling primitive it
    documents itself as reusing."""
    return f"({key_expr} % 1000003) * 2654435761 % 1000"
