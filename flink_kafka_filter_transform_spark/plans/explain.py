"""Physical-plan inspection: make scale discipline testable.

At 100 TB the difference between a good and a bad plan is not style —
broadcast vs shuffle join on a fact table is a 1000x traffic
difference. These helpers turn `.explain("formatted")` into
assertions so plan regressions fail CI like wrong results do:

- scans must show column pruning (ReadSchema) and predicate pushdown
  (PushedFilters) — a scan reading all columns for a 2-column
  projection re-reads the lake for nothing;
- dimension joins must be broadcast (no fact-table shuffle);
- stateless pipelines (parse/filter/route) must be shuffle-free;
- hot expressions must sit inside WholeStageCodegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain() prints)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def count_shuffles(df: DataFrame) -> int:
    """Number of ALGORITHMIC Exchange operators in the physical plan.

    Excludes the ingest-side REPARTITION_BY_NUM exchange that
    sources.parquet.load_table injects for sub-threshold single-row-
    group files (a toy-scale scan-parallelism fix that never fires on
    real-scale inputs) — the plan gates assert the shuffle inventory
    of the operators themselves, which is what scales to 100 TB."""
    plan = explain_str(df, "simple")
    total = len(re.findall(r"\bExchange\b", plan))
    ingest = len(re.findall(r"\bREPARTITION_BY_NUM\b", plan))
    return total - ingest


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def broadcast_join_count(df: DataFrame) -> int:
    plan = explain_str(df, "simple")
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("SortMergeJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (empty brackets excluded)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for every file scan in the plan."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*>)", explain_str(df))]


def scan_reads_only(df: DataFrame, allowed: set[str]) -> bool:
    """True if every file scan reads a subset of ``allowed`` columns —
    the column-pruning check."""
    for schema in read_schemas(df):
        cols = {c.split(":")[0].strip() for c in schema[len("struct<") : -1].split(",") if c}
        if not cols <= allowed:
            return False
    return True


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of EXPLICIT broadcast hints in the analyzed logical plan.

    A hint is unconditional — it pins a relation as broadcast no matter
    how large it grows, which is an OOM on any unbounded-cardinality
    side (e.g. a vocabulary aggregate at 100 TB). Size-based broadcasts
    chosen by the planner/AQE don't count: those re-decide per run.
    """
    qe = df._jdf.queryExecution()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", qe.analyzed().toString()))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen stages (simple mode marks them *(N)).

    A plan containing any Exchange (e.g. the ingest rebalance) is
    wrapped in ``AdaptiveSparkPlan isFinalPlan=false``, which hides the
    codegen markers until the plan actually runs — in that case this
    EXECUTES the frame once to finalize it (plan-audit helper for
    tests; don't call on production-sized frames)."""
    plan = explain_str(df, "simple")
    found = set(re.findall(r"\*\((\d+)\)", plan))
    if not found and "AdaptiveSparkPlan" in plan:
        df.collect()
        found = set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple")))
    return len(found)
