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


def drop_orphaned_table(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS plus removal of an ORPHANED managed
    location: a fresh session's in-memory catalog forgets managed
    tables but their warehouse directories persist on disk, so the
    next ``saveAsTable`` (even mode=overwrite — overwrite only applies
    to tables the catalog KNOWS) dies with LOCATION_ALREADY_EXISTS.
    Only a local warehouse is cleaned (the in-memory-catalog orphan
    problem is a local/test shape; a persistent metastore at scale
    never forgets the table, so overwrite handles it)."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme in ("", "file"):
        loc = os.path.join(wh.path, table.lower())
        if wh.path and os.path.isdir(loc):
            shutil.rmtree(loc)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: Sequence[str],
    buckets: int = 16,
    path: str | None = None,
) -> None:
    """Write `df` as a bucketed, per-bucket-sorted table."""
    if not path:
        drop_orphaned_table(df.sparkSession, table)
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
