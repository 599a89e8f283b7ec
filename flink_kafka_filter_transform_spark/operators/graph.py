"""Iterative graph algorithms on DataFrames: connected components.

The one place this engine runs a driver-side loop — label propagation
for connected components, the step that turns near-duplicate PAIRS
into dedup CLUSTERS (pick one canonical doc per cluster, drop the
rest: the standard web-scale dedup pipeline tail).

Scale shape: each iteration is one join + one min-aggregation, both
hash-partitioned on the vertex id — the same partitioning every
iteration, so at 100 TB the shuffle is stable and AQE-coalesced.
Iterations needed = graph diameter in label-hops (O(log n) for
near-dup clusters, which are tiny and dense). ``localCheckpoint``
truncates lineage each round — without it the plan tree doubles per
iteration and the driver dies long before the data does.

The DuckDB oracle computes the same components with a RECURSIVE CTE
(min reachable vertex id) — an independent fixpoint formulation
agreeing on every cluster assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 200
) -> DataFrame:
    """Min-label propagation. vertices: (id); edges: (src, dst).
    Returns (id, component) where component = min id in the component.

    Labels move one hop per iteration, so convergence takes O(graph
    diameter) rounds — near-dup clusters are dense (diameter ~ a few),
    but a pathological chain needs its full length. ``max_iter`` is a
    safety bound only: exhausting it without convergence RAISES rather
    than silently returning split components (which would let two
    'canonical' docs survive from one duplicate family)."""
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    lab = vertices.select("id", F.col("id").alias("component"))
    for _ in range(max_iter):
        nbr = (
            sym.join(lab, sym["src"] == lab["id"])
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("nbr_min"))
        )
        new = lab.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias(
                "component"
            ),
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        lab = new
        if changed == 0:
            return lab
    raise RuntimeError(
        f"connected_components did not converge within max_iter={max_iter} "
        "iterations; raise max_iter (graph diameter exceeds the bound)"
    )


def neardup_clusters(docs: DataFrame) -> DataFrame:
    """Cluster near-duplicate documents (MinHash-LSH verified pairs)
    and pick the canonical keeper per cluster.

    Output: one row per document — cluster_id (min doc_id in its
    component; singletons cluster alone), cluster_size, and is_kept
    (true for the canonical doc). Filtering is_kept deduplicates the
    corpus with exactly one survivor per near-dup family."""
    from flink_kafka_filter_transform_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    verts = docs.select(F.col("doc_id").alias("id")).distinct()
    comp = connected_components(verts, edges)
    sized = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sized, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            (F.col("id") == F.col("component")).alias("is_kept"),
        )
    )


def dedup_survivors(docs: DataFrame) -> DataFrame:
    """The deduplicated corpus: every document whose cluster keeper it
    is — the final artifact of exact+near dedup (pairs -> clusters ->
    one survivor per family). Downstream training jobs read THIS."""
    keep = neardup_clusters(docs).filter(F.col("is_kept")).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )
