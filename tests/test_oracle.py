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
