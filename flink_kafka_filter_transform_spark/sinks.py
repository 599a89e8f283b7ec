"""Batch sinks: partitioned parquet lake writes.

The reference's only sink is Kafka (streaming/pipeline.kafka_sink
mirrors it). An analytics engine also needs the lake-write side, and
at 100 TB the write layout IS the performance contract for every
downstream reader:

- ``partitionBy`` low-cardinality columns readers filter on (day,
  event_type) → partition pruning turns full scans into directory
  lookups;
- ``maxRecordsPerFile`` bounds file size so a single skewed partition
  ("yesterday") doesn't produce one 5 TB file that defeats split
  parallelism;
- repartition by the partition columns BEFORE the write so each task
  writes few files (without it, every one of 10k tasks opens a file
  per live partition → millions of small files, the classic lake
  failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partitioned parquet dataset with bounded file
    sizes and one-writer-per-partition task layout."""
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write parquet range-CLUSTERED on ``cluster_cols``: global range
    partition (each output file owns a disjoint key range) + sort
    within partitions (each ROW GROUP inside a file owns a narrow
    sub-range).

    Why this is a 100 TB lever: parquet footers carry per-row-group
    min/max statistics, and readers skip row groups whose range can't
    match the filter. On randomly-laid-out data every row group spans
    the whole key domain and nothing skips; after clustering, a point
    or range predicate touches only the files/row-groups covering its
    key range — the same scan goes from O(dataset) to O(selectivity).
    This is the single-column analog of Z-ordering (for multi-column
    locality, interleave the key bits first and cluster on that).
    ``tests/test_sinks.py`` measures the clustering factor from the
    actual parquet footer statistics rather than trusting the plan.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
) -> None:
    """Persist as a bucketed (hash-clustered, per-bucket sorted) catalog
    table. Two tables bucketed the same way join with ZERO shuffle —
    the 100 TB answer for a fact-fact join both sides too big to
    broadcast: pay the partitioning once at write time, reuse it on
    every subsequent join/aggregation on the bucket key."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )
