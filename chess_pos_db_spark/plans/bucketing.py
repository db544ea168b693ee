"""Bucketed-table layout (SURVEY.md §4 Φ1/Φ3 — the 100 TB join plan).

Range-sorted runs (layout.py) give scan pruning; bucketing gives
co-located JOINS: two tables bucketed by the same key into the same
bucket count join with NO shuffle exchange on either side — the
distributed equivalent of the reference keeping entries and headers
addressable by the same id space. At 100 TB the entries⋈games join (or
entries⋈entries self-join for retractions) is the dominant shuffle;
bucketing removes it.

Bucketed tables must be saved as managed/external tables (the bucket
metadata lives in the catalog), hence ``saveAsTable`` rather than bare
``parquet()``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def _default_managed_location(spark: SparkSession, table: str) -> str | None:
    """Default managed-table directory for `table` under a LOCAL
    warehouse, db-qualified aware (`db.tbl` → `<wh>/db.db/tbl`);
    None for a remote warehouse (never cleaned from here)."""
    import os
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme not in ("", "file") or not wh.path:
        return None
    parts = table.lower().split(".")
    if len(parts) == 1:
        return os.path.join(wh.path, parts[0])
    return os.path.join(wh.path, f"{parts[-2]}.db", parts[-1])


def clean_orphaned_location(spark: SparkSession, table: str) -> bool:
    """Remove an ORPHANED managed location — the catalog does NOT know
    `table` but its default warehouse directory persists on disk (a
    fresh session's in-memory catalog forgets managed tables, so the
    next ``saveAsTable`` — even mode=overwrite, which only applies to
    tables the catalog KNOWS — dies with LOCATION_ALREADY_EXISTS).
    Catalog-known tables are left alone: plain mode=overwrite handles
    them WITH Spark's cannot-overwrite-a-table-being-read analysis
    guard intact. Only a local warehouse is cleaned (the orphan
    problem is a local/test shape; a persistent metastore never
    forgets the table). Returns True iff a directory was removed."""
    import os
    import shutil

    if spark.catalog.tableExists(table):
        return False
    loc = _default_managed_location(spark, table)
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc)
        return True
    return False


def drop_orphaned_table(spark: SparkSession, table: str) -> None:
    """Guarantee `table` is absent from BOTH the catalog and its
    default managed location: DROP TABLE IF EXISTS (Spark deletes a
    managed table's directory with it) plus orphan-location cleanup
    for the forgotten-by-a-fresh-catalog case. For a plain rewrite of
    a catalog-known table prefer mode=overwrite (optionally after
    clean_orphaned_location) — it keeps Spark's
    cannot-overwrite-a-table-being-read guard; this helper is for
    callers that need the NAME free (e.g. ALTER TABLE RENAME swaps)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    clean_orphaned_location(spark, table)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: Sequence[str],
    buckets: int = 16,
    path: str | None = None,
) -> None:
    """Write `df` as a bucketed, per-bucket-sorted table. A
    catalog-known target is replaced via plain mode=overwrite so
    Spark's analysis guard still rejects overwriting a table the
    input plan reads from; only a truly orphaned location is cleaned."""
    if not path:
        clean_orphaned_location(df.sparkSession, table)
    writer = (
        df.write.mode("overwrite")
        .bucketBy(buckets, *key)
        .sortBy(*key)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def joined_without_shuffle(
    spark: SparkSession, left_table: str, right_table: str, key: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with zero Exchange
    operators — verify via explain (tests do).

    The MERGE hint pins the sort-merge strategy: at fixture scale the
    planner would otherwise pick a broadcast join (and skip the bucket
    layout entirely), which is the right call locally but not the plan
    under test — at 100 TB neither side broadcasts."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    # on=list(key) (not an expression condition) so the key columns
    # deduplicate in the output — the expression form left BOTH sides'
    # key columns, making result.select(key) fail with
    # AMBIGUOUS_REFERENCE. Same zero-Exchange bucketed SortMergeJoin.
    return left.join(right, on=list(key))
