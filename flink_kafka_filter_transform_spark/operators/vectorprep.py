"""Embedding preprocessing: L2 normalization and int8 quantization.

The vector-pipeline steps that precede indexing/serving at scale:
normalized vectors make cosine a plain dot product; max-abs int8
quantization cuts storage and bandwidth 4x with a per-vector scale.
Both are map-only Catalyst plans (no UDF, no shuffle).

Cross-engine determinism: norms fold left-to-right in double
(functions.vectors contract); quantization rounds via floor(x + 0.5)
rather than round() — Spark's HALF_UP and DuckDB's half-away-from-zero
agree on most inputs but are DIFFERENT functions, while floor(x+0.5)
is the same IEEE expression in both engines. Reconstruction error is
summed as exact DECIMAL so the report is bit-stable too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.functions.vectors import l2_norm


def l2_normalize(col: Column | str) -> Column:
    """Unit-norm copy of the vector (null if zero norm)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("array<double>")
    n = l2_norm(c)
    return F.when(n > 0, F.transform(c, lambda x: x / n))


def embedding_normalized_norms(emb: DataFrame) -> DataFrame:
    """Per-vector original norm + norm after normalization (sanity:
    the latter is 1.0 up to float rounding — reported, not assumed)."""
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        l2_norm(v).alias("norm"),
        l2_norm(l2_normalize(v)).alias("norm_after"),
    )


def embedding_quantize(emb: DataFrame) -> DataFrame:
    """Max-abs int8 quantization with reconstruction-error report.

    q_i = floor(v_i * 127 / max_abs + 0.5) in [-127, 127];
    error = sum(|v_i - q_i * scale|) as exact decimal -> double."""
    v = F.col("embedding").cast("array<double>")
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = max_abs / F.lit(127.0)
    q = F.transform(v, lambda x: F.floor(x * F.lit(127.0) / max_abs + F.lit(0.5)).cast("int"))
    # decimal sizing: element (20,18) + acc (30,18) adds WITHOUT scale
    # loss (Spark shrinks scale when precision would pass 38 — a silent
    # exactness leak); the per-step cast back to (30,18) is an identity
    # for any error mass under 10^12.
    recon_err = F.aggregate(
        F.zip_with(v, q, lambda x, qi: F.abs(x - qi.cast("double") * scale).cast("decimal(20,18)")),
        F.lit(0).cast("decimal(30,18)"),
        lambda acc, e: (acc + e).cast("decimal(30,18)"),
    ).cast("double")
    # Driver contract: no array-typed output columns (the harness
    # canonicalizer cannot hash list cells) — emit the quantized vector
    # as a comma-joined string; int->string formatting is identical in
    # Spark and DuckDB.
    q_str = F.array_join(F.transform(q, lambda x: x.cast("string")), ",")
    return emb.filter(max_abs > 0).select(
        "vec_id",
        scale.alias("scale"),
        q_str.alias("q8"),
        recon_err.alias("recon_err"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (deterministic)
# ---------------------------------------------------------------------------

JL_IN_DIM = 64
JL_OUT_DIM = 16  # sqrt(16) = 4 is float-exact, keeping the scale division clean


def _jl_matrix() -> list[list[float]]:
    """The +-1 Achlioptas projection matrix, derived from md5 so it is
    a deterministic constant embedded as literals in BOTH engines (no
    engine-side randomness; same idiom as the HLL ln table)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"jl:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1.0
            for j in range(JL_IN_DIM)
        ]
        for i in range(JL_OUT_DIM)
    ]


def _jl_components(v: Column) -> list[Column]:
    """The 16 projected components of a (cast-to-double) vector column,
    each a left-to-right fold in the shared cross-engine order."""
    rows = _jl_matrix()
    comps = []
    for i in range(JL_OUT_DIM):
        r = F.array(*[F.lit(x) for x in rows[i]])
        comps.append(
            F.aggregate(
                F.zip_with(v, r, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            / F.lit(4.0)
        )
    return comps


def jl_project(col: Column | str = "embedding") -> Column:
    """The projected vector as ``array<double>`` — feed this to the
    knn_* operators for reduced-dimension search (see knn_jl)."""
    v = (F.col(col) if isinstance(col, str) else col).cast("array<double>")
    return F.array(*_jl_components(v))


def jl_dim_ok(col: Column | str = "embedding") -> Column:
    """Guard: the projection matrix is JL_IN_DIM wide; a mismatched
    vector would zip_with-pad with NULLs and every output would be
    NULL — and the oracle would null-pad IDENTICALLY, so the
    differential gate would MATCH on garbage. Filter loudly instead
    (both engines apply the same predicate)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(c) == JL_IN_DIM


def jl_projection_distortion(emb: DataFrame) -> DataFrame:
    """Project each embedding 64 -> 16 dims with the +-1 JL matrix and
    report the norm distortion ||y|| / ||x|| (the JL lemma says ~1 +- eps
    — this query makes the guarantee observable per vector).

    Map-only: 16 left-to-right folds per vector (one per output
    component) + the norm ratio, all double arithmetic in the shared
    fold order so DuckDB reproduces it bit-exactly. At 100 TB this is
    the cheap preprocessing that shrinks ANN index memory 4x; the
    projected vectors would feed knn_* directly."""
    from flink_kafka_filter_transform_spark.functions.vectors import l2_norm

    v = F.col("embedding").cast("array<double>")
    comps = _jl_components(v)
    x_norm = l2_norm(v)
    # two-phase select: materialize y0..y15 as columns FIRST so each
    # 64-element fold evaluates exactly once per row (interpreted HOFs
    # don't reliably get common-subexpression elimination — squaring
    # the fold expressions inline would re-run them)
    projected = emb.filter(jl_dim_ok() & (x_norm > 0)).select(
        "vec_id",
        x_norm.alias("_xn"),
        *[c.alias(f"_y{i}") for i, c in enumerate(comps)],
    )
    # ||y||^2 summed in fixed component order (left-assoc chain)
    y_sq = F.col("_y0") * F.col("_y0")
    for i in range(1, JL_OUT_DIM):
        y_sq = y_sq + F.col(f"_y{i}") * F.col(f"_y{i}")
    return projected.select(
        "vec_id",
        F.col("_y0").alias("y0"),
        (F.sqrt(y_sq) / F.col("_xn")).alias("norm_ratio"),
    )


def embedding_label_outliers(emb: DataFrame) -> DataFrame:
    """Semantic-outlier profile per label: each vector's squared L2
    distance to its label centroid, flagged when it exceeds 4x the
    label's mean squared distance (2x the RMS radius). The embedding-
    space analog of relational.value_outliers_by_type — the quality
    gate a curation pipeline runs to catch mislabeled / off-topic
    documents before training.

    Float policy: centroids are exact DECIMAL(28,18) per-dimension
    means cast to double (order-independent, kmeans._update's rule);
    distances fold left-to-right in double (functions.vectors
    contract); per-label distance sums go through DECIMAL(28,6) so the
    mean is shuffle-order-proof. No sqrt needed — the threshold is
    squared on both sides.

    Scale shape: label cardinality is tiny vs the corpus, so the
    centroid relation and the per-label stats BROADCAST back onto the
    vector scan (two corpus passes, zero corpus shuffles beyond the
    label-keyed partial aggregates, which are map-side combined).
    """
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    pos = e.select("label", F.posexplode("v").alias("pos", "val"))
    cent = pos.groupBy("label", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cv")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
        ).alias("centroid")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("centroid"), lambda x, c: (x - c) * (x - c)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = e.join(F.broadcast(carr), "label").select(
        "label", "vec_id", d2.alias("d2")
    )
    stats = d.groupBy("label").agg(
        (
            F.sum(F.col("d2").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_dist2")
    )
    return (
        d.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.first("mean_dist2").alias("mean_dist2"),
            F.sum(
                F.when(F.col("d2") > F.lit(4.0) * F.col("mean_dist2"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select("label", "n_vectors", "mean_dist2", "n_outliers")
    )
