"""Distinct-count sketching: a deterministic, oracle-checkable
HyperLogLog.

``hll_distinct`` estimates per-group distinct keys with a classic
HLL-256 (p=8) built entirely from relational ops — the sketch shape
that replaces exact COUNT(DISTINCT) at 100 TB, where the exact form
must shuffle every distinct key and the sketch shuffles at most
``m=256`` register rows per group.

Plan shape (two aggregations, both map-side combinable):
  1. hash each key (portable 60-bit md5 hash, functions.hashing) →
     register index = low 8 bits, rho = leading-zero count of the
     remaining 52 bits + 1,
  2. groupBy(group, register) → max(rho)   [shuffle ≤ m rows/group]
  3. groupBy(group) → harmonic sum + estimate.

Cross-engine determinism (the whole point — a Spark HLL and a DuckDB
HLL normally disagree, making differential testing impossible):
- the hash is the shared md5-based 60-bit hash;
- 2^-rho terms are summed EXACTLY as integers: 2^(62-rho) is a
  bit-shift, summed into DECIMAL(38,0) — no float accumulation;
- the leading-zero count uses length(bin(x)) — identical string
  semantics in both engines — not transcendental log2;
- the small-range (linear counting) branch needs ln(m/zeros), and ln
  is NOT bit-identical across engines (measured: 18/255 inputs differ
  by 1 ulp). Since zeros has only 255 possible values, the table
  m*ln(m/zeros) is precomputed HERE in Python and embedded as
  literals in BOTH the Spark plan and the DuckDB oracle — zero
  engine-side transcendental math.

Estimator: Flajolet et al. 2007 (raw + small-range correction; the
large-range correction is unreachable with a 60-bit hash space).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_second,
    portable_hash64_sql,
)
from flink_kafka_filter_transform_spark.operators import params

P = 8
M = 1 << P  # 256 registers
REST_BITS = 60 - P  # 52
RHO_MAX = REST_BITS + 1  # 53, when the rest field is all zeros
# alpha_256 * m^2 * 2^62 — the raw-estimate numerator. Every literal is
# CAST to DOUBLE explicitly: a bare 0.7213 parses as DECIMAL in both
# engines, and their decimal-division rules differ (Spark rounds to a
# result scale, DuckDB switches to double) — a 1-ulp trap measured at
# sf0.01. With explicit doubles both engines run identical IEEE ops.
ALPHA_EXPR = (
    "(CAST(0.7213 AS DOUBLE) / "
    f"(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST({float(M)} AS DOUBLE)))"
)
_POW62 = "pow(2.0, 62.0)"
# Linear-counting lookup: m * ln(m / zeros) for zeros in 1..m-1.
# repr() gives shortest-round-trip literals -> both engines parse the
# exact same double.
LC_TABLE = [float(M) * math.log(float(M) / z) for z in range(1, M)]


def hll_registers(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """The HLL register relation: (group..., _idx, _r) with ``_r`` the
    max rho per register. This IS the sketch — fixed ≤m rows per group,
    and MERGEABLE: max is associative, so registers built at any finer
    granularity roll up to coarser groups by another max (see
    ``hll_rollup_users``), the property that lets 100 TB pipelines
    pre-aggregate sketches once and re-slice them for free."""
    # NULL keys are excluded on BOTH sides: md5(NULL) would otherwise
    # create a phantom NULL register inflating m_present, while the
    # exact count_distinct (and DuckDB's COUNT(DISTINCT)) ignore NULLs.
    h = portable_hash64(F.col(key).cast("string"))
    hashed = df.filter(F.col(key).isNotNull()).select(*group_cols, h.alias("_h")).select(
        *group_cols,
        (F.col("_h") % M).alias("_idx"),
        F.expr(f"_h div {M}").alias("_rest"),
    )
    rho = F.when(F.col("_rest") == 0, F.lit(RHO_MAX)).otherwise(
        F.lit(RHO_MAX) - F.length(F.bin(F.col("_rest")))
    )
    return (
        hashed.select(*group_cols, "_idx", rho.alias("_rho"))
        .groupBy(*group_cols, "_idx")
        .agg(F.max("_rho").alias("_r"))
    )


def hll_estimate_from_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Flajolet estimator over a register relation: harmonic sum with
    exact integer arithmetic + the embedded linear-counting table."""
    scaled = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(62 - _r AS INT))")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(scaled.cast("decimal(38,0)")).alias("_s_present"),
        F.count(F.lit(1)).alias("_m_present"),
    )
    # empty registers contribute 2^-0 = 1, i.e. 2^62 scaled — exact
    s_total = (
        F.col("_s_present")
        + (F.lit(M).cast("decimal(38,0)") - F.col("_m_present"))
        * F.lit(1 << 62).cast("decimal(38,0)")
    ).cast("double")
    raw = F.expr(f"{ALPHA_EXPR} * CAST({float(M * M)} AS DOUBLE) * {_POW62}") / s_total
    zeros = (F.lit(M) - F.col("_m_present")).cast("int")
    lc = F.element_at(F.array(*[F.lit(v) for v in LC_TABLE]), zeros)
    est = F.when((raw <= 2.5 * M) & (zeros > 0), lc).otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_estimate"))


def hll_distinct(df: DataFrame, key: str, group: str) -> DataFrame:
    """Per-``group`` HLL-256 distinct estimate of ``key`` alongside the
    exact count (the pair a user monitors to trust the sketch)."""
    df = df.filter(F.col(key).isNotNull())
    sketched = hll_estimate_from_registers(hll_registers(df, key, [group]), [group])
    exact = df.groupBy(group).agg(F.count_distinct(F.col(key)).alias("n_exact"))
    return exact.join(F.broadcast(sketched), group).select(
        group, "n_exact", "hll_estimate"
    )


def hll_distinct_sql(table: str, key: str, group: str) -> str:
    """DuckDB twin — same hash, same exact integer register sums, same
    embedded linear-counting literals."""
    h = portable_hash64_sql(f"CAST({key} AS VARCHAR)")
    lc_case = " ".join(
        f"WHEN {z} THEN {v!r}" for z, v in zip(range(1, M), LC_TABLE)
    )
    return f"""
WITH h AS (SELECT {group} AS g, {h} AS h FROM {table} WHERE {key} IS NOT NULL),
b AS (SELECT g, h % {M} AS idx, h // {M} AS rest FROM h),
r AS (
  SELECT g, idx,
    max(CASE WHEN rest = 0 THEN {RHO_MAX} ELSE {RHO_MAX} - length(bin(rest)) END) AS r
  FROM b GROUP BY g, idx
),
a AS (
  SELECT g,
    SUM(CAST(CAST(1 AS BIGINT) << CAST(62 - r AS INT) AS DECIMAL(38,0))) AS s_present,
    count(*) AS m_present
  FROM r GROUP BY g
),
e AS (
  SELECT g,
    {ALPHA_EXPR} * CAST({float(M * M)!r} AS DOUBLE) * {_POW62}
      / CAST(s_present + (CAST({M} AS DECIMAL(38,0)) - m_present)
             * CAST({1 << 62} AS DECIMAL(38,0)) AS DOUBLE) AS raw,
    CAST({M} - m_present AS INT) AS zeros
  FROM a
),
x AS (SELECT {group}, count(DISTINCT {key}) AS n_exact FROM {table} GROUP BY {group})
SELECT x.{group}, x.n_exact,
  CASE WHEN e.raw <= {2.5 * M!r} AND e.zeros > 0
       THEN CASE e.zeros {lc_case} END
       ELSE e.raw END AS hll_estimate
FROM x JOIN e ON x.{group} = e.g
"""


def hll_distinct_users(events: DataFrame) -> DataFrame:
    """Distinct users per event type: exact vs HLL-256 estimate."""
    return hll_distinct(events, key="user_id", group="event_type")


def hll_rollup_users(events: DataFrame) -> DataFrame:
    """Sketch MERGEABILITY, differentially proven: registers are built
    per (event_type, day) — the granularity a daily pipeline would
    persist — then rolled up to per-event_type sketches by a second
    max, never touching raw data again. Because register max is
    associative, the merged estimate must equal the direct one; the
    DuckDB oracle computes the DIRECT path, so the hash match IS the
    proof that day-sliced sketches merge losslessly."""
    from flink_kafka_filter_transform_spark.sources.parquet import ts_as_timestamp

    ev = events.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        F.date_format(ts_as_timestamp(events), "yyyy-MM-dd").alias("_day"),
        "user_id",
    )
    fine = hll_registers(ev, "user_id", ["event_type", "_day"])
    merged = fine.groupBy("event_type", "_idx").agg(F.max("_r").alias("_r"))
    sketched = hll_estimate_from_registers(merged, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_exact")
    )
    return exact.join(F.broadcast(sketched), "event_type").select(
        "event_type", "n_exact", "hll_estimate"
    )


def hll_distinct_orders(lineitem: DataFrame) -> DataFrame:
    """Distinct orders per return flag — high cardinality (tens of
    thousands per group at sf0.01), exercising the raw-estimator
    branch rather than linear counting."""
    return hll_distinct(lineitem, key="l_orderkey", group="l_returnflag")


# ---------------------------------------------------------------------------
# Count-Min Sketch: heavy-hitter frequency estimation
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_grid(docs: DataFrame) -> DataFrame:
    """The CMS counter grid (row, bucket, cell) over the corpus's
    tokens — factored out so the batch estimator (cms_token_counts)
    and the streaming maintainer (streaming.pipeline.cms_merge_sink)
    build the IDENTICAL structure. Grids are integer counters, so two
    grids merge by adding cells — the additive counterpart of the HLL
    registers' max-merge. One explode + one map-side-combined count;
    at most DEPTH*WIDTH rows out regardless of input size."""
    from flink_kafka_filter_transform_spark.operators.text import tokens

    ex = docs.select(F.explode(tokens()).alias("tok"))
    salted = ex.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (
                            portable_hash64(F.concat(F.lit(f"{j}:"), F.col("tok")))
                            % CMS_WIDTH
                        ).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    return salted.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cell"))


def cms_token_counts(docs: DataFrame, top_n: int = 20) -> DataFrame:
    """Count-Min Sketch frequency estimates for the corpus's top tokens.

    The CMS grid is DEPTH x WIDTH integer counters — the mergeable,
    fixed-size structure that replaces exact per-token counts when the
    vocabulary doesn't fit (estimate >= true count, off by collision
    mass only). Everything is exact integer arithmetic on the shared
    portable hash, so Spark and DuckDB build bit-identical grids —
    a sketch whose error is REPRODUCIBLE, not just bounded.

    Plan: one explode + one (row,bucket) count (map-combined, grid is
    DEPTH*WIDTH rows total) + a broadcast of the top-N probe set onto
    the tiny grid. Output: token, exact count, CMS estimate."""
    from flink_kafka_filter_transform_spark.operators.text import tokens

    ex = docs.select(F.explode(tokens()).alias("tok"))
    grid = cms_grid(docs)

    top = (
        ex.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("tok").asc())
        .limit(top_n)
    )
    probes = top.select(
        "tok",
        "n_exact",
        *[
            (portable_hash64(F.concat(F.lit(f"{j}:"), F.col("tok"))) % CMS_WIDTH).alias(
                f"b{j}"
            )
            for j in range(CMS_DEPTH)
        ],
    )
    est = probes
    for j in range(CMS_DEPTH):
        gj = grid.filter(F.col("row") == j).select(
            F.col("bucket").alias(f"b{j}"), F.col("cell").alias(f"c{j}")
        )
        est = est.join(F.broadcast(gj), f"b{j}")
    return est.select(
        F.col("tok").alias("token"),
        "n_exact",
        F.least(*[F.col(f"c{j}") for j in range(CMS_DEPTH)]).alias("cms_estimate"),
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantile sketch: mergeable approximate percentiles
# ---------------------------------------------------------------------------

HIST_BINS = 64


def histogram_quantiles(
    events: DataFrame,
    col: str = "value",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    group: str | None = None,
) -> DataFrame:
    """Approximate percentiles from a fixed-bin histogram, next to the
    exact sort-based answer (the error report a user needs to trust the
    sketch) — globally or per ``group``. Completes the sketch family:
    HLL (distinct), CMS (frequency), histogram (quantiles), each with a
    grouped form.

    Why this shape at 100 TB: exact percentiles SORT each group; the
    histogram is one map pass + a shuffle of at most HIST_BINS counter
    rows PER GROUP (map-side combined), and — like the HLL registers —
    bin counts are MERGEABLE (they add), so per-partition/per-day
    histograms roll up for free. Unlike t-digest/approx_percentile,
    fixed bins are deterministic and cross-engine reproducible: the
    estimate is pure double arithmetic on (min, max, bin counts),
    replicated exactly by the DuckDB oracle. Estimate: locate the bin
    where the cumulative count crosses p*n, then interpolate linearly
    inside it. The per-group stats relation is group-cardinality-sized
    and broadcasts back onto the scan.
    """
    from pyspark.sql.window import Window

    v = F.col(col).cast("double")
    # Global case: a bare lit("all") is constant-folded OUT of the
    # Window partition spec, so WindowExec logs "No Partition Defined"
    # on every run even though the window only ever sees <=HIST_BINS
    # bin rows. The guarded form has the same value on every surviving
    # row (the isNotNull filter precedes it) but blocks
    # FoldablePropagation, keeping the (single-valued) partition key in
    # the plan — the correct physical shape for a bin-count relation,
    # minus the false alarm.
    g = F.col(group) if group else F.when(v.isNotNull(), F.lit("all"))
    vals = events.filter(v.isNotNull()).select(g.alias("_g"), v.alias("_v"))
    stats = vals.groupBy("_g").agg(
        F.min("_v").alias("_mn"), F.max("_v").alias("_mx"), F.count(F.lit(1)).alias("_n")
    )
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(HIST_BINS))
    idx = F.least(
        F.lit(HIST_BINS - 1),
        F.floor((F.col("_v") - F.col("_mn")) / width).cast("int"),
    )
    # degenerate all-equal group: width 0 -> everything in bin 0
    idx = F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(idx)
    counts = (
        vals.join(F.broadcast(stats), "_g")
        .groupBy("_g", idx.alias("idx"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = counts.withColumn(
        "cume",
        F.sum("cnt").over(
            Window.partitionBy("_g").orderBy("idx").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    # labels are PYTHON-built literals, never engine-side float
    # formatting (locale/format rules differ across engines)
    p_rows = stats.select(
        "_g",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(str(p)).alias("pct"), F.lit(float(p)).alias("p"))
                    for p in percentiles
                ]
            )
        ).alias("_p"),
        "_mn",
        "_mx",
        "_n",
    ).select("_g", F.col("_p.pct").alias("pct"), F.col("_p.p").alias("p"), "_mn", "_mx", "_n")
    target = F.col("p") * F.col("_n").cast("double")
    win = (
        p_rows.join(cum, "_g")
        .filter(F.col("cume").cast("double") >= target)
        .groupBy("_g", "pct", "p", "_mn", "_mx", "_n")
        .agg(F.min("idx").alias("idx"))
        .join(cum, ["_g", "idx"])
    )
    w_ = (F.col("_mx") - F.col("_mn")) / F.lit(float(HIST_BINS))
    before = (F.col("cume") - F.col("cnt")).cast("double")
    est = (
        F.col("_mn")
        + F.col("idx").cast("double") * w_
        + (target - before) / F.col("cnt").cast("double") * w_
    )
    est = F.when(F.col("_mx") == F.col("_mn"), F.col("_mn")).otherwise(est)
    sketch_df = win.select("_g", "pct", est.alias("approx"))
    # ONE array-form percentile aggregate: each separate percentile(p)
    # call maintains its own buffer of every distinct value — the
    # array form shares a single buffer across all requested points.
    p_arr = ", ".join(repr(p) for p in percentiles)
    exact = (
        events.filter(v.isNotNull())
        .groupBy(g.alias("_g"))
        .agg(F.expr(f"percentile(CAST({col} AS DOUBLE), array({p_arr}))").alias("_es"))
        .select(
            "_g",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(str(p)).alias("pct"),
                            F.element_at(F.col("_es"), i + 1).alias("exact"),
                        )
                        for i, p in enumerate(percentiles)
                    ]
                )
            ).alias("_s"),
        )
        .select("_g", "_s.pct", "_s.exact")
    )
    out = sketch_df.join(F.broadcast(exact), ["_g", "pct"])
    if group:
        return out.select(F.col("_g").alias(group), "pct", "approx", "exact")
    return out.select("pct", "approx", "exact")


def histogram_quantiles_by_type(events: DataFrame) -> DataFrame:
    """Per-event_type quantile sketch — the grouped form a dashboard
    actually queries (p50/p90/p99 latency-style rollups per key)."""
    return histogram_quantiles(events, group="event_type")


# ---------------------------------------------------------------------------
# Bloom filter: mergeable set-membership sketch
# ---------------------------------------------------------------------------
#
# The third classic sketch family next to HLL (distinct) and CMS
# (frequency): at 100 TB an exact membership set (e.g. "every n-gram of
# every benchmark") can be too large to broadcast as raw hashes, but a
# Bloom filter over it is a FIXED-SIZE bitset — here 64 BIGINT
# registers = 3968 bits — built with one map-side-combinable bit_or
# aggregation and broadcast everywhere for a shuffle-free probe.
# Registers are mergeable (bit_or is associative/commutative), so
# per-partition / per-day filters roll up for free, the same property
# hll_rollup_users demonstrates for HLL.
#
# Cross-engine determinism: bit positions come from the shared md5
# double-hash (h1 + j*h2, j = 1..K) mod 64*62; 62 usable bits per
# register keep every shiftleft strictly positive in both engines.


def bloom_build(keys: DataFrame, hash_col: str = "gh") -> DataFrame:
    """Aggregate a (h1, h2) keyed relation into Bloom registers
    (reg, bits): for each key and probe j in 1..K, set bit
    (h1 + j*h2) mod (REGS*REG_BITS). One tiny bit_or aggregation;
    the result is <= BLOOM_REGS rows regardless of input size."""
    m = params.BLOOM_REGS * params.BLOOM_REG_BITS
    probes = keys.select(
        F.explode(
            F.array(
                *[
                    ((F.col("_h1") + j * F.col("_h2")) % m).alias("p")
                    for j in range(1, params.BLOOM_K + 1)
                ]
            )
        ).alias("p")
    )
    return (
        probes.select(
            F.expr(f"p div {params.BLOOM_REG_BITS}").alias("reg"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {params.BLOOM_REG_BITS} AS INT))").alias("_b"),
        )
        .groupBy("reg")
        .agg(F.expr("bit_or(_b)").alias("bits"))
    )


def bloom_contamination(docs: DataFrame, n: int = 3, eval_mod: int = 50) -> DataFrame:
    """Decontamination via a Bloom membership sketch, side-by-side with
    the exact probe: eval-set token n-grams (docs with
    doc_id % eval_mod == 0, as in dedup.contamination_check) are folded
    into a 3968-bit Bloom filter; every training doc's distinct grams
    probe the filter AND the exact hash set, so the report quantifies
    the sketch's false-positive behavior on real data:

      (doc_id, n_grams, bloom_hits, true_hits, false_positives)

    Plan shape: the filter is <= 64 rows — broadcast-joined twice (one
    per probe position, both map-side); the exact set broadcasts as in
    contamination_check; ONE doc-keyed shuffle total. At 100 TB the
    probe is a map-only pass over the corpus; only the per-doc counters
    shuffle. The K probe positions are computed IN-ROW (no explode), so
    the gram relation is never widened.

    Why both numbers: bloom_hits >= true_hits always (no false
    negatives); the gap IS the measured FP count, the quantity that
    decides whether the fixed-size sketch can replace the exact
    broadcast set at a given corpus scale."""
    from flink_kafka_filter_transform_spark.operators.text import token_ngrams, tokens

    m = params.BLOOM_REGS * params.BLOOM_REG_BITS
    grams = docs.select(
        "doc_id", token_ngrams(tokens(), n).alias("grams")
    ).filter(F.size("grams") > 0)
    eval_keys = (
        grams.filter(F.col("doc_id") % eval_mod == 0)
        .select(F.explode("grams").alias("g"))
        .select(
            portable_hash64("g").alias("_h1"),
            portable_hash64_second("g").alias("_h2"),
        )
        .distinct()
    )
    bloom = bloom_build(eval_keys)
    # Dedupe on gh ALONE (eval_keys is distinct on the (h1, h2) PAIR):
    # an h1 collision between two distinct eval grams would otherwise
    # leave duplicate gh rows that fan out the left join, while the
    # oracle's `gh IN (...)` has semi-join semantics (r5 ADVICE).
    exact = (
        eval_keys.select(F.col("_h1").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = (
        grams.filter(F.col("doc_id") % eval_mod != 0)
        .select("doc_id", F.explode("grams").alias("g"))
        .select(
            "doc_id",
            portable_hash64("g").alias("gh"),
            portable_hash64_second("g").alias("_h2"),
        )
    )
    probe = train
    for j in range(1, params.BLOOM_K + 1):
        pos = (F.col("gh") + j * F.col("_h2")) % m
        probe = probe.withColumn(f"_r{j}", F.expr(
            f"CAST(((gh + {j} * _h2) % {m}) div {params.BLOOM_REG_BITS} AS BIGINT)"
        )).withColumn(f"_p{j}", (pos % params.BLOOM_REG_BITS).cast("int"))
    for j in range(1, params.BLOOM_K + 1):
        b = bloom.select(
            F.col("reg").alias(f"_r{j}"), F.col("bits").alias(f"_bits{j}")
        )
        probe = probe.join(F.broadcast(b), f"_r{j}", "left")
    in_bloom = None
    for j in range(1, params.BLOOM_K + 1):
        bit_set = (
            F.coalesce(F.col(f"_bits{j}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), _p{j})")
            )
            != 0
        )
        in_bloom = bit_set if in_bloom is None else (in_bloom & bit_set)
    probed = probe.join(F.broadcast(exact), "gh", "left")
    agg = probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(in_bloom.cast("bigint")).alias("bloom_hits"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint")).alias("true_hits"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "bloom_hits",
        "true_hits",
        (F.col("bloom_hits") - F.col("true_hits")).alias("false_positives"),
    )
