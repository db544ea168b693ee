"""SparkSession factory with scale-aware defaults.

Design notes (100 TB posture):
- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast
  selection replace hand-tuned partition counts on a real cluster.
- ``spark.sql.shuffle.partitions`` defaults to the local core count for
  fixture scale; on a cluster this is superseded by AQE's coalescing
  (initialPartitionNum would be sized to ~2-3x total cores).
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (duckdb timestamps are UTC-naive).
- Arrow enabled: every pandas interchange (createDataFrame, toPandas,
  pandas UDFs) is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "chess_pos_db_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type, so read as epoch-nanos LONG and convert in the
        # loader (tables.t) — matches DuckDB's truncate-to-micros read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Every bucketed table this engine writes is a PROBE layout
        # (postings/doclen/df, IVF cells, entry buckets): it is either
        # probed with a bucket-key filter — where bucket pruning is the
        # point — or joined on its bucket key. Spark's
        # DisableUnnecessaryBucketedScan rule would silently drop the
        # bucketed scan (and with it SelectedBucketsCount pruning) when
        # the probe's join keys differ from the bucket key, e.g. the
        # positional phrase walk (token-bucketed postings joined on
        # doc_id) — turning a read-1-of-16-buckets probe into a full
        # scan. The rule's upside (file-split parallelism on FULL scans
        # of bucketed tables) doesn't apply here: full scans of these
        # tables happen only in compaction jobs, where bucket count is
        # sized to the cluster anyway.
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Scale-dependent settings stay parameterised (guide §9 / cluster
    # posture): any SPARK_GRAFT_CONF_<key with __ for .> env var is
    # applied verbatim, so a cluster submit can raise e.g.
    # spark.sql.files.maxPartitionBytes to 1g or set
    # spark.sql.adaptive.advisoryPartitionSizeInBytes=256m without
    # code edits — while the local defaults above keep the driver's
    # bench comparable across rounds. Example:
    #   SPARK_GRAFT_CONF_spark__sql__files__maxPartitionBytes=1g
    for env_key, val in os.environ.items():
        if env_key.startswith("SPARK_GRAFT_CONF_"):
            conf_key = env_key[len("SPARK_GRAFT_CONF_"):].replace("__", ".")
            builder = builder.config(conf_key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
