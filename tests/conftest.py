from __future__ import annotations

import os

import pytest

from chess_pos_db_spark.session import get_spark

# Correctness tests default to the smallest fixture for speed; the
# driver's own gate runs at sf0.01. Override with SPARK_GRAFT_TEST_SF_DIR.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("chess_pos_db_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
