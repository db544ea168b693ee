"""Driver-environment independence: an external driver may launch the
engine from ANY cwd (not the repo root). Executor Python workers then
can't rely on inherited sys.path to import the package when unpickling
module-level functions — tables._ship_package must make every
Python-boundary query (pandas UDF / mapInPandas / mapInArrow /
applyInPandas) and the chess import path work regardless.

Run in a subprocess so the SparkSession/JVM is genuinely fresh and
launched from a foreign cwd — reusing the test session would mask the
bug (its workers inherit the repo cwd).
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
sf = "/root/testdata/sf0.001"
# one query per Python-worker seam: pandas UDF, arrow UDF, mapInPandas,
# mapInArrow, applyInPandas
for name in (
    "udf_scalar",
    "udf_arrow_scalar",
    "udtf_expand",
    "udf_map_in_arrow",
    "grouped_map_normalize",
):
    assert qs[name](spark, sf).count() > 0, name

# chess import + export round trip exercises the pgn/board unpickling
import tempfile

from chess_pos_db_spark.chess import importer

d = tempfile.mkdtemp()
src = d + "/g.pgn"
open(src, "w").write(
    '[Event "E"]\n[White "W"]\n[Black "B"]\n[Result "1-0"]\n\n1. e4 e5 1-0\n'
)
importer.import_pgn(spark, [(src, "human")], d + "/db", store_moves=True)
stats = importer.export_pgn(spark, d + "/db", d + "/out", shards=1)
assert stats["games"] == 1, stats
print("WORKER_ENV_OK")
"""


@pytest.mark.slow
def test_python_worker_queries_from_foreign_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=REPO)],
        cwd="/tmp",
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "WORKER_ENV_OK" in proc.stdout
