"""Oracle-differential tests: every registered query with an oracle is
executed in Spark and in DuckDB and compared exactly — the local mirror
of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import chess_pos_db_spark as engine
from tests.oracle_util import compare, duck_connection

QUERIES = engine.get_queries()
ORACLES = engine.get_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_driver_hashable(name, spark, sf_dir):
    """The external gate canonicalizes results with pandas sort_values
    over every column; a top-level ARRAY/MAP/STRUCT column is unhashable
    there and errors the gate even when the answer is exact (round 5:
    ``array_suite``).  Pin that every registered query's output schema
    is scalar-only — serialize complex columns (array_join / to_json)
    inside the query instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = QUERIES[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} returns complex-typed top-level column(s) {bad}; the "
        "driver's pandas canonicalizer cannot hash these — serialize "
        "them to scalars in the query"
    )


def test_rotation_history_names_are_registered():
    """Every name in the verification-history frozensets must still be a
    registered query — catches silent drift between the rotation
    bookkeeping and the registry."""
    from chess_pos_db_spark import verification_history as vh

    for label, names in (
        ("ROUND12_VERIFIED", vh.ROUND12_VERIFIED),
        ("ROUND3_VERIFIED", vh.ROUND3_VERIFIED),
        ("ROUND4_VERIFIED", vh.ROUND4_VERIFIED),
        ("ROUND5_VERIFIED", vh.ROUND5_VERIFIED),
        ("ROUND1_REGISTRY", vh.ROUND1_REGISTRY),
    ):
        missing = set(names) - set(QUERIES)
        assert not missing, f"{label} names not in registry: {missing}"
