"""Vector math over ``array<float/double>`` columns — pure Catalyst.

Dot product / norm / cosine are expressed with ``zip_with`` +
``aggregate`` higher-order functions: they run JVM-side inside
whole-stage codegen, no Python boundary, no UDF. Elements are cast to
double FIRST and folded strictly left-to-right, which makes the result
bit-identical to a DuckDB ``list_reduce(list_transform(...))`` fold in
the oracle — floating-point equality across engines requires identical
operand types and association order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right double-precision dot product."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


# --- DuckDB oracle twins (same fold order, same double casts) ---------------

def dot_sql(a: str, b: str) -> str:
    # CAST(0.0 AS DOUBLE): DuckDB parses bare 0.0 as DECIMAL, which would
    # change the fold arithmetic vs Spark's double accumulate.
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip({a}, {b}),"
        f" z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), (acc, x) -> acc + x)"
    )


def norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform({a},"
        f" v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (acc, x) -> acc + x))"
    )


def cosine_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {norm_sql(a)} > 0 AND {norm_sql(b)} > 0"
        f" THEN {dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}) END"
    )
