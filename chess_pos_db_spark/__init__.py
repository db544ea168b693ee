"""PySpark-native analytics engine with the query and data-processing
capabilities of Sopel97/chess_pos_db, rebuilt Spark-first.

Public surface:
- ``get_queries()`` / ``get_oracles()`` — the driver-contract registry
  (every SURVEY.md §2 operator with its DuckDB oracle SQL);
- ``session.get_spark()`` — configured SparkSession factory;
- ``tables.t()`` — fixture loaders.
"""

from __future__ import annotations

from . import registry
from .registry import ORACLES, QUERIES
from .verification_history import rotation_key


def _rotated(d: dict) -> dict:
    """Stable-reorder so the driver's first-50 CORRECTNESS gate hits
    (a) never-externally-verified queries, then (b) the stalest
    externally-verified oracle-backed greens — see
    verification_history.rotation_key."""
    names = list(d)
    return {
        n: d[n]
        for n in sorted(
            names,
            key=lambda n: (*rotation_key(n, n in ORACLES), names.index(n)),
        )
    }


def get_queries():
    registry.load_all()
    return _rotated(dict(QUERIES))


def get_oracles():
    registry.load_all()
    return _rotated(dict(ORACLES))
