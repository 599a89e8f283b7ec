"""Local twin of the driver's DuckDB differential gate.

Runs a Spark DataFrame and a DuckDB oracle SQL over the same parquet
tables, aligns columns by name, sorts rows, and compares values
cell-by-cell (exact for non-floats, 1e-9 relative for floats — the
driver hashes values, so floats are additionally checked for exact
string equality and reported when only close)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return str(v)


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns, key=str.lower)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def _spark_num_class(dt: str) -> str | None:
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    return None


def _arrow_num_class(t) -> str | None:
    import pyarrow.types as pt

    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"  # e.g. DuckDB HUGEINT sums surface as decimal128
    return None


def compare_exact(spark_df, sql: str, sf_dir: str) -> None:
    pdf_s = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    try:
        tbl_d = con.execute(sql).arrow()
    finally:
        con.close()
    pdf_d = tbl_d.to_pandas()

    cols_s = sorted(c.lower() for c in pdf_s.columns)
    cols_d = sorted(c.lower() for c in pdf_d.columns)
    assert cols_s == cols_d, f"column mismatch: spark={cols_s} duckdb={cols_d}"
    assert len(pdf_s) == len(pdf_d), f"row count mismatch: spark={len(pdf_s)} duckdb={len(pdf_d)}"

    # Driver-strictness twin: the driver's value-hash is dtype-sensitive
    # (int64 4 != float64 4.0 when %.9g canon differs — this masked the
    # events_sessionized HUGEINT->float64 divergence in round 1).
    # Compare LOGICAL numeric classes — Spark schema vs DuckDB's Arrow
    # schema — which, unlike pandas dtype kinds, survive pandas' null
    # coercion (int-with-NULL becomes float64 on both sides), so
    # null-bearing numeric columns are checked too.
    duck_types = {f.name.lower(): _arrow_num_class(f.type) for f in tbl_d.schema}
    for f in spark_df.schema.fields:
        cs = _spark_num_class(f.dataType.simpleString())
        cd = duck_types.get(f.name.lower())
        if cs is not None or cd is not None:
            assert cs == cd, (
                f"numeric-type mismatch on '{f.name}': spark={f.dataType.simpleString()} "
                f"duckdb-arrow={cd} (driver value-hash may fail — CAST the oracle side)"
            )

    rows_s, rows_d = _canon(pdf_s), _canon(pdf_d)
    diffs = [(a, b) for a, b in zip(rows_s, rows_d) if a != b]
    assert not diffs, f"{len(diffs)} differing rows; first 3: {diffs[:3]}"
