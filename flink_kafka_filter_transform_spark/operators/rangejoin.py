"""Interval/range join — the second custom operator Spark lacks as a
built-in (alongside ``asof``).

A naive range join (``l.user = r.user AND r.ts BETWEEN l.ts - W AND
l.ts``) forces Catalyst into a per-key nested loop: with millions of
events per hot user that is |L|x|R| per key — fatal at 100 TB.
``range_join_bucketed`` restores an equi-join by time-bucketing:

  1. pick bucket width = the window length W,
  2. each LEFT row probes exactly 2 buckets (its own + the previous —
     a window of width W can only span 2 W-aligned buckets),
  3. equi-join on (key, bucket) — hash join, AQE-skew-splittable —
  4. re-apply the exact range predicate as a post-filter.

Join fan-in per left row is bounded by 2 buckets of right rows instead
of the full key history, and the shuffle is a plain hash partition on
(key, bucket). This is the standard stream-interval-join layout (same
trick Flink's interval join and KDB's window join use physically).

The DuckDB oracle runs the naive inequality join — fine at sf0.01 —
so the bucketed rewrite is differentially checked against the direct
semantics, not against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Inner-join left rows to right rows with ``l.ts - W < r.ts <= l.ts``
    on the same key. Returns all left columns + all right columns."""
    bucket_l = F.floor(F.col(left_ts) / F.lit(window_us))
    bucket_r = F.floor(F.col(right_ts) / F.lit(window_us))
    probes = left.withColumn(
        "_bucket", F.explode(F.array(bucket_l - 1, bucket_l))
    )
    built = right.withColumn("_bucket", bucket_r)
    return (
        probes.join(built, [key, "_bucket"])
        .filter(
            (F.col(right_ts) > F.col(left_ts) - F.lit(window_us))
            & (F.col(right_ts) <= F.col(left_ts))
        )
        .drop("_bucket")
    )


def purchases_with_recent_clicks(events: DataFrame, window_us: int = HOUR_US) -> DataFrame:
    """Per purchase event: how many clicks the same user made in the
    preceding hour (exclusive-start, inclusive-end window). Zero-click
    purchases are kept (left semantics via join-back + coalesce)."""
    from flink_kafka_filter_transform_spark.sources.parquet import ts_as_micros

    ts_us = ts_as_micros(events)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event_id"), ts_us.alias("p_ts_us")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", ts_us.alias("c_ts_us")
    )
    matched = range_join_bucketed(
        purchases, clicks, key="user_id", left_ts="p_ts_us", right_ts="c_ts_us",
        window_us=window_us,
    )
    counts = matched.groupBy("user_id", "p_event_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return purchases.join(counts, ["user_id", "p_event_id"], "left").select(
        "user_id",
        F.col("p_event_id").alias("event_id"),
        F.col("p_ts_us").alias("ts_us"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_clicks_1h"),
    )
