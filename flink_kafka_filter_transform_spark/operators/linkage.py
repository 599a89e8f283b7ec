"""Record linkage / entity resolution — blocked fuzzy matching of
entity names, the classic master-data problem (the same customer keyed
twice with a typo) and a training-data need the dedup family doesn't
cover: document dedup keys on CONTENT similarity (shingles, hashes),
linkage keys on short IDENTIFIER strings where one wrong character IS
the duplicate signal and Jaccard over shingles is far too coarse.

Blocking strategy: the SYMMETRIC DELETE neighborhood (SymSpell, Garbe
2012 — public algorithm): each string's block keys are itself plus
every one-character-deletion variant. Two strings within Levenshtein
distance 1 ALWAYS share a key —

  * equal strings share the identity variant,
  * a substitution pair shares the variant deleting the substituted
    position from both,
  * an insert/delete pair shares the shorter string itself —

so candidate recall for d <= 1 is EXACT (no probabilistic miss like
LSH), while candidate volume stays ~(L+1) keys per row instead of the
naive all-pairs join. Verification is the built-in ``levenshtein``
(JVM-side, whole-stage codegen) — blocked-then-verified, the same
generate/verify shape as minhash_lsh_pairs.

The DuckDB oracle is the NAIVE quadratic join (fine at sf0.01), so the
deletion-neighborhood blocking is differentially checked against
direct edit-distance semantics, not against itself.

Oracle contract scope — ASCII identifiers: Spark's ``levenshtein``
counts CHARACTERS while DuckDB's counts BYTES (measured:
levenshtein('café', 'cafe') = 1 vs 2; pinned in
tests/test_regex_dialect.py). The engines agree exactly on ASCII,
which the customer-name fixture is at every sf (also pinned); a
non-ASCII corpus diverges at the ORACLE, not the engine — the
char-based distance this operator computes is the correct semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Skew guard, same role and default as LSH_BUCKET_CAP's family: a block
# key shared by more than this many DISTINCT entities is degenerate
# (for name data that means a mass-duplicated placeholder like "N/A" —
# linking everything to everything is noise, not signal) and is
# dropped. Sized so it never fires on the customer fixture at any
# tested sf (deletion-variant blocks there are <= ~20 names — the
# one-sided above-cap divergence rule the LSH ops document applies).
EDIT_BLOCK_CAP = 1000


def deletion_variants(col: str):
    """array<string>: the string itself + every one-char-deletion
    variant, deduplicated (deleting any of a run of equal characters
    yields the same variant — e.g. the leading-zero run in zero-padded
    ids — and duplicate keys would only re-emit the same candidate).
    Pure Catalyst HOF over ``sequence`` — no UDF, codegen'd."""
    return F.array_distinct(
        F.expr(
            f"concat(array({col}), transform(sequence(1, length({col})), i -> "
            f"concat(substring({col}, 1, i - 1), "
            f"substring({col}, i + 1, length({col})))))"
        )
    )


def variant_exploded(rows: DataFrame, key_col: str, name_col: str) -> DataFrame:
    """(k, nm, variant): one row per deletion variant of each entity —
    the blocking relation every linkage face shares (self-join pairs,
    cross-relation probe, streaming index; r12 single-source factoring,
    same rationale as rangejoin.overlap_*: candidate recall depends on
    both sides deriving variants IDENTICALLY, so there is one copy)."""
    return (
        rows.select(F.col(key_col).alias("k"), F.col(name_col).alias("nm"))
        .filter(F.col("nm").isNotNull())
        .select("k", "nm", F.explode(deletion_variants("nm")).alias("variant"))
    )


# Pair expansion over one sorted block ``ds`` of (k, nm) structs:
# every i < j pair, preserving both names for the verify stage. Shared
# by the batch self-join operator and the streaming face's
# within-batch expansion (the SORTED_PAIR_EXPANSION discipline).
VARIANT_PAIR_EXPANSION = (
    "flatten(transform(ds, (a, i) -> "
    "transform(slice(ds, i + 2, size(ds) - i - 1), b -> "
    "struct(a.k AS ak, a.nm AS anm, "
    "b.k AS bk, b.nm AS bnm))))"
)


def edit_distance_pairs(
    rows: DataFrame,
    key_col: str,
    name_col: str,
    *,
    block_cap: int = EDIT_BLOCK_CAP,
) -> DataFrame:
    """All pairs of rows whose ``name_col`` values are within
    Levenshtein distance 1, as (a_<key>, b_<key>, distance) with
    a < b. Generic over any (key, string) relation.

    Plan shape: one explode (fan-out <= L+1 variants per row, bounded
    by string length), ONE shuffle keyed by variant into
    collect_set'd blocks (the hamming_chunk_pairs bucket-collect
    layout — the upstream is a single cheap scan and block size is
    capped, so map-side pair expansion beats a self-join here), pairs
    expanded from each sorted block, distinct (a pair can share
    several variants), then the exact verify filter. No broadcast, no
    cartesian, nothing corpus-sized on the driver."""
    ak, bk = f"a_{key_col}", f"b_{key_col}"
    # r15 (guide §2): the deletion-variant explode fans every row out
    # ~L+1 times with substring work BEFORE the blocking shuffle, at
    # the SCAN's parallelism — 4.7 s in three tasks on the toy-scale
    # customer file. Scale-adaptive: a real-scale scan is never touched
    # (streaming faces call variant_exploded directly and keep their
    # per-batch relations as delivered).
    from flink_kafka_filter_transform_spark.sources.parquet import (
        respread_if_underpartitioned,
    )

    rows = respread_if_underpartitioned(rows)
    ex = variant_exploded(rows, key_col, name_col)
    blocks = (
        ex.groupBy("variant")
        .agg(F.array_sort(F.collect_set(F.struct("k", "nm"))).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= block_cap))
    )
    cand = (
        blocks.select(F.explode(F.expr(VARIANT_PAIR_EXPANSION)).alias("p"))
        .select("p.ak", "p.anm", "p.bk", "p.bnm")
        .distinct()
    )
    return (
        cand.withColumn("distance", F.levenshtein("anm", "bnm"))
        .filter(F.col("distance") <= 1)
        .select(
            F.col("ak").alias(ak),
            F.col("bk").alias(bk),
            F.col("distance").cast("int").alias("distance"),
        )
    )


def name_edit_neighbors(customer: DataFrame) -> DataFrame:
    """Customer names within one edit of each other — the entity-
    resolution readout over the customer master (zero-padded
    sequential names make the expected pair set closed-form: exactly
    the id pairs differing in one decimal digit)."""
    return edit_distance_pairs(customer, "c_custkey", "c_name")


def cross_edit_linkage(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_name: str,
    right_key: str,
    right_name: str,
    *,
    block_cap: int = EDIT_BLOCK_CAP,
) -> DataFrame:
    """TWO-relation record linkage (r11 VERDICT item 5): every
    (left row, right row) pair whose name strings are within
    Levenshtein distance 1, as (<left_key>, <right_key>, distance) —
    the production entity-resolution shape (a landed batch probed
    against a master table), where ``edit_distance_pairs`` is the
    within-one-relation special case. The symmetric-delete recall
    argument is unchanged: any cross pair at d <= 1 shares a deletion
    variant, so blocking recall is EXACT.

    Plan shape — index-and-probe, not a self-join: the RIGHT side (by
    convention the smaller master/dimension) is built into a
    variant-keyed block index (ONE shuffle, collect_set capped at
    ``block_cap`` — a block over the cap is a degenerate placeholder
    value and is dropped, the one-sided divergence rule the LSH
    family documents); the LEFT side explodes to (k, nm, variant)
    rows (fan-out <= len+1) and equi-joins the index — Catalyst/AQE
    broadcasts the index when it is small and shuffle-joins
    otherwise, and a hot left variant costs at most ``block_cap``
    candidate rows per probe row. Candidates dedup on the full pair
    (several shared variants propose the same pair), then the exact
    ``levenshtein`` verify runs JVM-side. Nothing is corpus-sized on
    the driver; raw relations shuffle once each. Output keys keep
    their own column names (the two relations' key columns must be
    named differently — asserted, since a shared name would silently
    collapse the output schema)."""
    if left_key == right_key:
        raise ValueError(
            f"cross_edit_linkage needs distinct key column names on the two "
            f"relations (both are {left_key!r}); alias one side first"
        )
    if "distance" in (left_key, right_key):
        raise ValueError(
            "cross_edit_linkage emits a 'distance' column; a key column "
            "named 'distance' would duplicate it — alias the key first"
        )
    lv = variant_exploded(left, left_key, left_name)
    idx = (
        variant_exploded(right, right_key, right_name)
        .groupBy("variant")
        .agg(F.array_sort(F.collect_set(F.struct("k", "nm"))).alias("ds"))
        .filter(F.size("ds") <= block_cap)
    )
    cand = (
        lv.join(idx, "variant")
        .select(
            F.col("k").alias("lk"),
            F.col("nm").alias("lnm"),
            F.explode("ds").alias("d"),
        )
        .select("lk", "lnm", F.col("d.k").alias("rk"), F.col("d.nm").alias("rnm"))
        .distinct()
    )
    return (
        cand.withColumn("distance", F.levenshtein("lnm", "rnm"))
        .filter(F.col("distance") <= 1)
        .select(
            F.col("lk").alias(left_key),
            F.col("rk").alias(right_key),
            F.col("distance").cast("int").alias("distance"),
        )
    )


# The 9-digit zero-padded entity id embedded in TPC-H-shaped names
# ("Customer#000000042" / "Supplier#000000042"): both prefixes are 9
# characters, so the id starts at position 10. Linking on the id
# suffix (not the full name — the differing prefixes put every cross
# pair at distance >= 8) is the classic id-reconciliation case: the
# same entity keyed in two systems, tolerating one mistyped digit.
NAME_ID_START = 10
NAME_ID_LEN = 9


def supplier_customer_linkage(
    customer: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Registered cross-relation linkage: probe the customer master
    with the supplier master's 9-digit name ids, keeping pairs within
    one digit typo — (c_custkey, s_suppkey, distance). The supplier
    side is the smaller relation at every TPC-H scale (1:15), so it
    becomes the block index; the DuckDB oracle is the naive quadratic
    cross join, so the two-sided variant blocking is differentially
    checked against direct edit-distance semantics."""
    idcol = lambda c: F.substring(F.col(c), NAME_ID_START, NAME_ID_LEN)  # noqa: E731
    return cross_edit_linkage(
        customer.select("c_custkey", idcol("c_name").alias("_cid")),
        supplier.select("s_suppkey", idcol("s_name").alias("_sid")),
        "c_custkey",
        "_cid",
        "s_suppkey",
        "_sid",
    )
