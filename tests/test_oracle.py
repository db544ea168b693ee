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


def _assert_driver_hashable(name, df):
    """The external gate canonicalizes results with pandas sort_values
    over every column; a top-level ARRAY/MAP/STRUCT column is unhashable
    there and errors the gate even when the answer is exact (round 5:
    ``array_suite``). Checked on the SAME DataFrame the oracle/rows-only
    tests already build — the former standalone 256-parameter sweep
    rebuilt every query plan (re-running eager-checkpoint jobs) for a
    static schema property, ~2 min of pure duplication per suite run."""
    from pyspark.sql.types import ArrayType, MapType, StructType

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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    _assert_driver_hashable(name, df)
    compare(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    _assert_driver_hashable(name, df)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_rotation_history_names_are_registered():
    """Every name in the verification-history frozensets must still be a
    registered query — catches silent drift between the rotation
    bookkeeping and the registry."""
    from chess_pos_db_spark import verification_history as vh

    for label, names in (
        ("ROUND1_2_VERIFIED", vh.ROUND1_2_VERIFIED),
        ("ROUND3_VERIFIED", vh.ROUND3_VERIFIED),
        ("ROUND4_VERIFIED", vh.ROUND4_VERIFIED),
        ("ROUND5_VERIFIED", vh.ROUND5_VERIFIED),
        ("ROUND6_VERIFIED", vh.ROUND6_VERIFIED),
        ("ROUND7_VERIFIED", vh.ROUND7_VERIFIED),
        ("ROUND8_VERIFIED", vh.ROUND8_VERIFIED),
        ("ROUND9_VERIFIED", vh.ROUND9_VERIFIED),
        ("ROUND10_VERIFIED", vh.ROUND10_VERIFIED),
        ("ROUND11_VERIFIED", vh.ROUND11_VERIFIED),
        ("ROUND12_VERIFIED", vh.ROUND12_VERIFIED),
        ("ROUND1_REGISTRY", vh.ROUND1_REGISTRY),
    ):
        missing = set(names) - set(QUERIES)
        assert not missing, f"{label} names not in registry: {missing}"


def test_rotation_is_least_recently_verified_first():
    """Round-7 policy pin (round-6 verdict item #1): with the
    never-verified set empty, get_queries()'s first 50 must be exactly
    the 50 least-recently-driver-verified ORACLE-BACKED names (a gate
    rerun on an oracle-less name can only record rows-only — wasted
    slot), ordered oldest-round-first with registration order breaking
    ties; and any future never-verified registration must sort before
    all of them."""
    import chess_pos_db_spark as engine
    from chess_pos_db_spark import verification_history as vh

    q = engine.get_queries()
    oracles = engine.get_oracles()
    names = list(q)

    never = [n for n in names if n not in vh.DRIVER_VERIFIED]
    # never-verified names (new registrations) must lead the ordering
    for n in never:
        assert names.index(n) < 50 or len(never) > 50

    verified_with_oracle = [
        n for n in names if n in vh.DRIVER_VERIFIED and n in oracles
    ]
    # within the verified-with-oracle block, last-verified round must be
    # non-decreasing
    rounds = [vh.LAST_VERIFIED_ROUND[n] for n in verified_with_oracle]
    assert rounds == sorted(rounds), (
        "verified oracle-backed queries are not ordered "
        "least-recently-verified-first"
    )

    # oracle-less verified names must all sort after every oracle-backed one
    no_oracle = [n for n in names if n in vh.DRIVER_VERIFIED and n not in oracles]
    if verified_with_oracle and no_oracle:
        assert names.index(no_oracle[0]) > names.index(verified_with_oracle[-1])

    # the concrete round-7 gate slate: 50 oracle-backed names, all from
    # the stalest rounds on record
    first50 = names[: 50]
    if not never:
        assert all(n in oracles for n in first50)
        stalest = sorted(
            verified_with_oracle,
            key=lambda n: (vh.LAST_VERIFIED_ROUND[n], names.index(n)),
        )[:50]
        assert first50 == stalest
