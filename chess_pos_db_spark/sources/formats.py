"""Generic text-format ingest sources: CSV and JSON-lines.

The engine's canonical storage is Parquet (columnar, pushdown-friendly,
row-group statistics); CSV/JSONL exist as INGEST formats — what corpus
dumps and event logs actually arrive as. Discipline encoded here:

- **Explicit schema, never inference.** Schema inference is a full
  extra pass over the data (at 100 TB, a second 100 TB scan) and can
  silently flip types between batches; ingest schemas are declared.
- **PERMISSIVE + corrupt-record capture.** Malformed rows land in
  ``_corrupt_record`` instead of failing the job or being silently
  dropped — the malformed-row discipline (SURVEY P7) extended to the
  source boundary. Quarantine = ``WHERE _corrupt_record IS NOT NULL``.
- **Line-splittable parallelism.** Both formats split by line, so a
  single large file fans out across executors like the chunked PGN
  source — no single-task ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """Explicit-schema CSV scan with malformed-row quarantine."""
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if header:
        # Spark's default (enforceSchema=true) DISCARDS the header and
        # binds columns by position — a file whose column order differs
        # from the declared schema silently mis-assigns every value.
        # Strict mode fails the read loudly on a name mismatch instead,
        # which is this module's malformed-input discipline applied to
        # the file's own self-description. Headerless CSVs can only
        # bind positionally, so the option applies only with a header.
        reader = reader.option("enforceSchema", False)
    return reader.csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Explicit-schema JSON-lines scan with malformed-row quarantine."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_records).

    Spark refuses scans whose required schema is ONLY the internal
    corrupt-record column (the raw-file re-read would be ambiguous), so
    the parsed frame is cached before splitting — the documented
    pattern. At 100 TB you would not split-and-count interactively:
    write clean and quarantine streams in the same pass (two sinks off
    one scan, or foreachBatch) instead of caching the corpus.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_orc_run(
    df: DataFrame, path: str, key: list[str], partitions: int | None = None
) -> None:
    """Sorted ORC run — the alternate columnar container. ORC carries
    the same pruning machinery as Parquet (stripe-level min/max +
    optional bloom per column), so a key-clustered ORC run serves the
    probe-join workload identically; which container wins is a
    deployment question (existing lakes, Hive compatibility), not an
    engine one. Delegates to plans/layout.write_sorted_run so the run
    discipline (range partitioning, in-partition sort, manifest) has
    ONE owner and ORC runs are manifest-readable like Parquet ones."""
    from ..plans.layout import write_sorted_run

    write_sorted_run(
        df,
        path,
        key,
        partitions=partitions,
        file_format="orc",
        options={"orc.bloom.filter.columns": ",".join(key)},
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; predicate pushdown reaches stripe stats exactly like
    the Parquet path (pinned in tests/test_sources.py)."""
    return spark.read.orc(path)
