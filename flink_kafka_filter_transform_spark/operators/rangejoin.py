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


# ---------------------------------------------------------------------------
# Interval x interval overlap join (r10) — the third temporal-join
# member: asof (point latest-before point), range_join_bucketed (point
# in trailing window), and now interval OVERLAP (both sides are
# [start, end] spans). Classic uses: shipment/transit windows sharing
# a dock, concurrent sessions, booking conflicts.
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000
# Derived transit duration: 1 + (l_orderkey + l_linenumber) % 14 days —
# deterministic from key columns so the DuckDB oracle reproduces the
# interval table exactly (the testdata carries no receipt date).
TRANSIT_MOD_DAYS = 14
# Bucket width must exceed the max interval length: every interval then
# spans AT MOST 2 width-aligned buckets, so the explode fan-out is <= 2
# rows per interval regardless of corpus size.
OVERLAP_BUCKET_DAYS = 16


def lineitem_transit_intervals(lineitem: DataFrame) -> DataFrame:
    """(l_suppkey, iid, start_day, end_day) transit interval per
    lineitem: start = epoch-day of l_shipdate (floor(us / day), NOT
    ``DIV`` — DIV truncates toward zero, so a pre-1970 timestamp
    would land on the wrong day; floor matches the bucketing helpers'
    convention below and is exact for |us| < 2^52, the repo's
    float-free-in-effect discipline; values are identical on the
    1992+ fixture), end = start + the derived duration, both
    INCLUSIVE days. ``iid`` is the composite row id ``l_orderkey * 8
    + l_linenumber`` (linenumber <= 7 in TPC-H-shaped data) — one
    bigint so pair ordering is a scalar comparison instead of a
    cross-engine struct ordering."""
    from flink_kafka_filter_transform_spark.sources.parquet import ts_as_micros

    day = f"CAST(floor(_us / {DAY_US}) AS BIGINT)"
    return lineitem.select(
        "l_suppkey",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("iid"),
        ts_as_micros(lineitem, "l_shipdate").alias("_us"),
        (
            F.lit(1)
            + (F.col("l_orderkey") + F.col("l_linenumber")) % TRANSIT_MOD_DAYS
        ).alias("_dur"),
    ).select(
        "l_suppkey",
        "iid",
        F.expr(day).alias("start_day"),
        (F.expr(day) + F.col("_dur")).alias("end_day"),
    )


# --- shared bucketing machinery (r11 review): the batch operator and
# the streaming face (streaming.pipeline._ivo_overlap_batch) must use
# BYTE-IDENTICAL bucket assignment, side projections, ownership
# predicate, and overlap arithmetic — exactly-once depends on it, and
# the r11 DIV-to-floor fix had to touch every copy. These helpers are
# the single source of truth so drift is impossible.


def overlap_bucketed(iv: DataFrame) -> DataFrame:
    """Explode intervals into the day-axis buckets they touch.
    floor(x / B), NOT x DIV B: DIV truncates toward zero, so days
    -1..-B would share bucket 0 with days 0..B-1 and the ownership
    predicate would mis-assign pre-1970 intervals; floor keeps bucket
    boundaries uniform across zero (the hypothesis twin runs negative
    days)."""
    B = OVERLAP_BUCKET_DAYS
    return iv.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"floor(start_day / {B})"), F.expr(f"floor(end_day / {B})")
            )
        ),
    )


def overlap_side(ex: DataFrame, prefix: str) -> DataFrame:
    """One side of the (supplier, bucket) equi-join, columns prefixed
    ``a_``/``b_``."""
    return ex.select(
        F.col("l_suppkey").alias("suppkey"),
        "_bucket",
        F.col("iid").alias(f"{prefix}_iid"),
        F.col("start_day").alias(f"{prefix}_start"),
        F.col("end_day").alias(f"{prefix}_end"),
    )


def overlap_pred():
    """Exact overlap + bucket-OWNERSHIP predicate (symmetric in the
    a/b sides): only the bucket containing greatest(a_start, b_start)
    emits a pair — both intervals contain that day, so both were
    exploded into that bucket and each pair survives exactly once."""
    B = OVERLAP_BUCKET_DAYS
    return (
        (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end"))
        & (F.col("_bucket") == F.expr(f"floor(greatest(a_start, b_start) / {B})"))
    )


def overlap_days():
    """Inclusive-day overlap length (symmetric)."""
    return F.least("a_end", "b_end") - F.greatest("a_start", "b_start") + F.lit(1)


def interval_overlap_pairs(lineitem: DataFrame) -> DataFrame:
    """Per-supplier overlap profile of transit intervals: for every
    pair of SAME-supplier lineitems whose [start_day, end_day] spans
    intersect, the overlap length in days — aggregated per supplier
    (n_pairs / sum / max) so the readout is supplier-cardinality.

    A naive interval self-join (``a.start <= b.end AND b.start <=
    a.end``) is a per-key nested loop — |L|^2 per supplier, fatal when
    a hot key holds millions of rows. The equi-join restoration is the
    interval analog of range_join_bucketed's trick:

      1. bucket the DAY AXIS at width B >= max interval length + 1,
      2. explode each interval into the <= 2 buckets it touches,
      3. equi-join on (supplier, bucket) — hash join, AQE
         skew-splittable —
      4. re-apply the exact overlap predicate, and
      5. keep each pair ONCE via bucket OWNERSHIP: only the bucket
         containing the overlap's start day (= greatest of the two
         starts) emits the pair. Both intervals contain that day, so
         both were exploded into that bucket — exactly-once without a
         distinct.

    Deliberately a SELF-JOIN, not the bucket-collect pair expansion
    hamming_chunk_pairs uses: the upstream here is a cheap parquet
    scan (reading it twice costs nothing — the r9 double-decode
    conviction applies to EXPENSIVE upstreams like Arrow media
    decode), and a joined hot (supplier, fortnight) cell is split by
    AQE skew handling, whereas a collected array's quadratic expansion
    runs in one task. The oracle is the NAIVE inequality join, so the
    bucketing + ownership rewrite is differentially checked against
    direct semantics, not against itself.

    The join is PINNED to shuffle_hash (the token_frequency_score
    rule): both sides are the corpus by construction, so broadcast is
    wrong at every real scale — and Catalyst's size estimate through
    the explode is unreliable enough to pick it (measured at sf1: the
    static plan broadcast the 12M-row exploded side and ran 22.9 s;
    the same query at sf3, tipped over the threshold into a shuffle
    join, ran 15.3 s on 3x the data — the cliff this hint deletes).
    AQE's skew-join handling applies to shuffled hash joins, so the
    hot-cell split argument above survives the pin."""
    ex = overlap_bucketed(lineitem_transit_intervals(lineitem))
    left = overlap_side(ex, "a")
    right = overlap_side(ex, "b")
    pairs = (
        left.join(right.hint("shuffle_hash"), ["suppkey", "_bucket"])
        .filter((F.col("a_iid") < F.col("b_iid")) & overlap_pred())
        .select("suppkey", overlap_days().alias("overlap_days"))
    )
    return (
        pairs.groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("overlap_days").alias("sum_overlap_days"),
            F.max("overlap_days").alias("max_overlap_days"),
        )
        .select(
            F.col("suppkey").alias("l_suppkey"),
            "n_pairs",
            "sum_overlap_days",
            "max_overlap_days",
        )
    )
