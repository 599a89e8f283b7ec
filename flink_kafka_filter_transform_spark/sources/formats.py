"""Multi-format ingestion: CSV / JSON-lines / ORC / text sources.

The reference ingests exactly one format (JSON envelopes off Kafka,
src/mq/kafka.rs:53-55). A general engine meets data where it lives;
these wrappers keep every format behind the same declarative
``spark.read`` surface so Catalyst still prunes columns and (for
columnar formats) pushes filters.

Scale rules encoded here:

- ALWAYS pass an explicit schema. Schema inference reads the data
  twice (a full extra pass at 100 TB) and silently changes types when
  the sample does — the classic pipeline-breaks-on-Tuesday bug.
- ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` for CSV/JSON:
  malformed rows land in a quarantine column instead of killing the
  job (the same discard-don't-panic stance as the CDC parse path,
  SURVEY §3.4).
- Text files read as one row per line with the path attached — the
  shape a document-corpus ingest wants (files -> (path, line) ->
  parse downstream).
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.names:
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with explicit schema and quarantined malformed rows."""
    return (
        spark.read.schema(_with_corrupt_col(schema))
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines with explicit schema and quarantined malformed rows."""
    return (
        spark.read.schema(_with_corrupt_col(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet: pruning + pushdown apply."""
    return spark.read.orc(path)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """One row per line with the source file attached:
    (source_file, line). Deliberately NO per-file line number: that
    would need a window over source_file (a full-corpus shuffle) or a
    per-file zip pass — when position matters, derive a content hash
    or pre-number at write time instead."""
    return spark.read.text(path).select(
        F.input_file_name().alias("source_file"),
        F.col("value").alias("line"),
    )


@contextmanager
def quarantine_split(df: DataFrame) -> Iterator[tuple[DataFrame, DataFrame]]:
    """Context manager yielding the (clean, quarantined) split of a
    PERMISSIVE-parsed frame; the backing cache is released on exit.

    Caches the parsed frame first: Spark disallows queries that touch
    ONLY the corrupt-record column of a raw CSV/JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    documented workaround is exactly this cache), and both halves of
    the split re-read the same parse anyway, so the cache pays for
    itself. The context-manager shape makes the cache's lifetime
    explicit — a bare function that caches and hopes the caller
    remembers to unpersist accumulates storage in long-lived sessions.

    ::

        with quarantine_split(parsed) as (clean, bad):
            clean.write.parquet(out)
            bad.write.json(quarantine_dir)
    """
    cached = df.cache()
    try:
        clean = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        bad = cached.filter(F.col(CORRUPT_COL).isNotNull())
        yield clean, bad
    finally:
        cached.unpersist()
