"""Replicate the external driver's CORRECTNESS gate over the ENTIRE
registry (the driver itself covers the first 50 rotation entries per
round): bare SparkSession, DuckDB views over the same parquet, sorted
exact row comparison. Writes CORRECTNESS_local.json.

Run:  python tools/driver_check.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    out: dict[str, dict] = {}
    n_fail = 0
    for name, fn in qs.items():
        rec: dict = {}
        try:
            s = sorted(
                tuple(str(x) for x in r) for r in fn(spark, sf_dir).collect()
            )
            rec["spark_rows"] = len(s)
            if name in oracles:
                d = sorted(
                    tuple(str(x) for x in r)
                    for r in con.execute(oracles[name]).fetchall()
                )
                rec["oracle_rows"] = len(d)
                rec["match"] = s == d
                if not rec["match"]:
                    n_fail += 1
            else:
                rec["match"] = None  # rows-only
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = str(ex)[:300]
            n_fail += 1
        out[name] = rec
        status = (
            "ERR" if "err" in rec
            else "rows-only" if rec["match"] is None
            else "ok" if rec["match"] else "MISMATCH"
        )
        print(f"{status:>9}  {name}", flush=True)

    with open("CORRECTNESS_local.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{len(out)} queries, {n_fail} failures -> CORRECTNESS_local.json")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
