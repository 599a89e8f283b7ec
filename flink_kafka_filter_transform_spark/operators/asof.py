"""As-of (point-in-time) join — a custom operator Spark lacks natively.

``asof_join`` matches each left row with the most recent right row at
or before its timestamp, per key. The implementation is the
scale-correct union + window trick:

  1. tag right rows, union with left rows (same shape),
  2. one hash partition by key + one sort by (ts, right-first),
  3. ``last(value, ignorenulls=True)`` over the running frame carries
     the latest right row forward onto every left row.

Cost: ONE shuffle of |L|+|R| rows and one sort — compare a naive
range-join (|L| x |R| per key blowup) or per-key collect. This is how
you do point-in-time feature lookup (e.g. "latest model score / price
/ profile as of event time") over 100 TB: the partitioning is the same
hash-by-key any downstream per-key aggregation wants, so it's reusable.

The DuckDB oracle uses its NATIVE ``ASOF JOIN`` — an independent
implementation agreeing on every row is a much stronger check than a
mirrored window trick.

Tie rules (made explicit, both engines): right rows at ts equal to the
left ts ARE visible (<=); the right side must be unique per (key, ts)
— callers dedupe with ``max_by`` first (asof semantics with duplicate
timestamps are undefined in any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + latest right ``value_cols`` as of the left timestamp.

    Right rows must be unique per (key, right_ts). Output keeps every
    left row/column plus ``value_cols`` (null when no prior right row).
    """
    lcols = left.columns
    # Carry the whole right ROW as one non-null struct, not each value
    # column separately: last(col, ignorenulls) on a bare value column
    # would (a) skip a legitimately-NULL value and fall back to an
    # OLDER right row, and (b) with several value_cols let each column
    # come from a DIFFERENT right row. The struct is non-null for every
    # right row even when all its fields are null, so the carry always
    # picks the latest right row — matching DuckDB's native ASOF JOIN.
    row_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
    )
    tagged_r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts first at equal ts -> visible
        row_struct.alias("_v"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
    )
    tagged_l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        null_struct.alias("_v"),
        *[F.col(c) for c in lcols if c != key],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "*", F.last("_v", ignorenulls=True).over(w).alias("_asof")
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(key),
        *[F.col(c) for c in lcols if c != key],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def events_last_purchase(events: DataFrame) -> DataFrame:
    """Each event joined with the user's most recent purchase at or
    before the event (point-in-time feature lookup on the events
    table). Purchases deduped to one per (user, ts) via max_by."""
    from flink_kafka_filter_transform_spark.sources.parquet import ts_as_micros

    ts_us = ts_as_micros(events)
    evs = events.select("user_id", F.col("event_id"), ts_us.alias("ts_us"), "event_type")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", ts_us.alias("p_ts_us"), "value", "event_id")
        .groupBy("user_id", "p_ts_us")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    return asof_join(
        evs,
        purchases,
        key="user_id",
        left_ts="ts_us",
        right_ts="p_ts_us",
        value_cols=["purchase_value"],
    )
