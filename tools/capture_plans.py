"""Capture .explain("formatted") for queries into plans/<tag>/.

Run:  python tools/capture_plans.py <tag> [--suffix _before] [--sf DIR] [names...]
      (no names -> the bench.py HEADLINE list)

Writes plans/<tag>/<query><suffix>.txt with the formatted physical plan
(initial AQE plan — the shape the judge audits: Exchange count, join
strategy, PushedFilters/ReadSchema, Python eval nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    args = sys.argv[1:]
    tag = args.pop(0)
    suffix, sf_dir = "_before", "/root/testdata/sf0.1"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--suffix":
            suffix = next(it)
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    import chess_pos_db_spark as engine
    from chess_pos_db_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.HEADLINE)

    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    queries = engine.get_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = explain_formatted(df)
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}{suffix}.txt")


if __name__ == "__main__":
    main()
