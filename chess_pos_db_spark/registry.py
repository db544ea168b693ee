"""Query registry: the single source of truth for the driver contract.

Every operator from SURVEY.md §2 that is driver-checked registers here as
a named query (PySpark callable) plus, when SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports these.

Oracle discipline (see FIXTURES.md):
- alias every computed column identically on both sides;
- the driver's value-hash is order-insensitive but column names are
  sorted before hashing, so names must match exactly;
- double-typed aggregates are rounded on BOTH sides so float summation
  order cannot flip the hash;
- DuckDB `SUM(INTEGER)` returns HUGEINT → always CAST to BIGINT in the
  oracle; Spark `count()` and DuckDB `COUNT(*)` are both BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Register a driver query; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    Failure-atomic: a module that raises mid-import after some
    register() calls would otherwise leave its entries behind, so the
    RETRY would die on 'duplicate query name' and mask the root cause.
    On failure, every registration this call added is rolled back —
    AND every registering submodule imported by this call is purged
    from sys.modules, because modules that imported successfully
    before the failure stay cached there: a retry would no-op their
    import (register() never re-runs) and silently succeed with a
    permanently shrunken registry."""
    global _LOADED
    if _LOADED:
        return
    import sys

    _before_q = set(QUERIES)
    _before_o = set(ORACLES)
    _before_m = set(sys.modules)
    try:
        _import_registering_modules()
    except BaseException:
        for k in set(QUERIES) - _before_q:
            del QUERIES[k]
        for k in set(ORACLES) - _before_o:
            del ORACLES[k]
        pkg = __name__.rsplit(".", 1)[0]
        for m in set(sys.modules) - _before_m:
            if m.startswith(pkg + "."):
                del sys.modules[m]
        raise
    _LOADED = True


def _import_registering_modules() -> None:
    from .operators import aggregates  # noqa: F401
    from .operators import filters  # noqa: F401
    from .operators import joins  # noqa: F401
    from .operators import windows  # noqa: F401
    from .operators import sorts  # noqa: F401
    from .operators import setops  # noqa: F401
    from .operators import events  # noqa: F401
    from .operators import extras  # noqa: F401
    from .operators import extras2  # noqa: F401
    from .operators import ivm  # noqa: F401
    from .operators import merge  # noqa: F401
    from .operators import tpch  # noqa: F401
    from .operators import tpch2  # noqa: F401
    from .operators import validate  # noqa: F401
    from .functions import scalar  # noqa: F401
    from .functions import udfs  # noqa: F401
    from .llm import chunking  # noqa: F401
    from .llm import dedup  # noqa: F401
    from .llm import dedup_index  # noqa: F401
    from .llm import mining  # noqa: F401
    from .llm import pipeline  # noqa: F401
    from .llm import quality  # noqa: F401
    from .plans import mv  # noqa: F401
    from .plans import skew  # noqa: F401
    from .plans import store  # noqa: F401
    from .llm import scoring  # noqa: F401
    from .llm import search  # noqa: F401
    from .llm import similarity  # noqa: F401
    from .llm import text  # noqa: F401
    from .streaming import windows as stream_windows  # noqa: F401
