"""Import-throughput benchmark (not driver-run; the reference's own
headline metric is import speed — README cites ~10^5-10^6 positions/s
multithreaded on a desktop).

Generates a deterministic random-game corpus as PGN, runs the full
create pipeline (parse → replay/explode → aggregate → sorted write),
and reports positions/second. Run: python bench_import.py [n_files
games_per_file]. With n_files=1 this benchmarks the chunk-splitting
source on ONE large file (the reference's primary real-world input
shape) — throughput should hold within ~0.8x of the many-files run at
the same game count."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from chess_pos_db_spark.chess import pgn
from chess_pos_db_spark.chess.importer import import_pgn
from chess_pos_db_spark.session import get_spark


def make_corpus(n_files: int, games_per_file: int, out_dir: str) -> list[str]:
    # 64 distinct random games (generation itself is slow python chess;
    # replication across files is fine — parse+replay still runs per game)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.test_properties import random_game

    distinct = []
    for seed in range(64):
        _, sans = random_game(seed, max_plies=50)
        distinct.append(
            pgn.format_game(
                {
                    "Event": f"bench-{seed}",
                    "White": f"W{seed}",
                    "Black": f"B{seed}",
                    "WhiteElo": str(2000 + seed),
                    "BlackElo": str(2000 + (seed * 7) % 400),
                },
                sans,
                "WDB"[seed % 3],
            )
        )
    paths = []
    for i in range(n_files):
        path = os.path.join(out_dir, f"bench_{i}.pgn")
        with open(path, "w") as f:
            for g in range(games_per_file):
                f.write(distinct[(i * games_per_file + g) % len(distinct)])
                f.write("\n")
        paths.append(path)
    return paths


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    games_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    tmp = tempfile.mkdtemp(prefix="import_bench_")
    paths = make_corpus(n_files, games_per_file, tmp)
    spark = get_spark("import-bench")

    start = time.perf_counter()
    stats = import_pgn(
        spark, [(p, "human") for p in paths], os.path.join(tmp, "db")
    )
    elapsed = time.perf_counter() - start
    print(
        json.dumps(
            {
                "metric": "import_positions_per_sec",
                "value": round(stats["positions"] / elapsed, 1),
                "unit": "positions/sec",
                "positions": stats["positions"],
                "games": stats["games"],
                "n_files": n_files,
                "elapsed_sec": round(elapsed, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
