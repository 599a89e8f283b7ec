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


def compare_exact(spark_df, sql: str, sf_dir: str) -> None:
    pdf_s = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    try:
        pdf_d = con.execute(sql).df()
    finally:
        con.close()

    cols_s = sorted(c.lower() for c in pdf_s.columns)
    cols_d = sorted(c.lower() for c in pdf_d.columns)
    assert cols_s == cols_d, f"column mismatch: spark={cols_s} duckdb={cols_d}"
    assert len(pdf_s) == len(pdf_d), f"row count mismatch: spark={len(pdf_s)} duckdb={len(pdf_d)}"

    # Driver-strictness twin: the driver's value-hash is dtype-sensitive
    # (int64 4 != float64 4.0 even when %.9g canon agrees — this masked
    # the events_sessionized HUGEINT->float64 divergence in round 1).
    # Compare numeric dtype KINDS per column; skip columns containing
    # nulls, where pandas itself coerces ints to float on either side.
    pdf_d.columns = [c.lower() for c in pdf_d.columns]
    for c in pdf_s.columns:
        s, d = pdf_s[c], pdf_d[c.lower()]
        ks, kd = s.dtype.kind, d.dtype.kind
        if {ks, kd} <= {"i", "u", "f"} and not (s.isna().any() or d.isna().any()):
            int_kinds = {"i", "u"}
            assert (ks in int_kinds) == (kd in int_kinds), (
                f"dtype-kind mismatch on '{c}': spark={s.dtype} duckdb={d.dtype} "
                "(driver value-hash would fail — CAST the oracle side)"
            )

    rows_s, rows_d = _canon(pdf_s), _canon(pdf_d)
    diffs = [(a, b) for a, b in zip(rows_s, rows_d) if a != b]
    assert not diffs, f"{len(diffs)} differing rows; first 3: {diffs[:3]}"
