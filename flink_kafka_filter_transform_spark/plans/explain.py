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


_INGEST_SCAN_RE = re.compile(r"(documents|embeddings)\.parquet")
# Nodes Catalyst may push between the ingest repartition and its scan
# (projection collapse / filter pushdown travel through a round-robin
# repartition); anything else under the exchange means it is NOT the
# ingest rebalance.
_PASSTHROUGH_RE = re.compile(r"\b(Project|Filter|ColumnarToRow)\b")


def count_shuffles(df: DataFrame) -> int:
    """Number of ALGORITHMIC Exchange operators in the physical plan.

    Excludes ONLY the ingest-side REPARTITION_BY_NUM exchange that
    sources.parquet.load_table injects for sub-threshold single-row-
    group files (a toy-scale scan-parallelism fix that never fires on
    real-scale inputs): a REPARTITION_BY_NUM exchange whose child
    chain is pass-through nodes down to a parquet scan of a rebalance
    table. An operator-level repartition(n) anywhere deeper in the
    plan (salting an aggregate, coalescing a join result, ...) COUNTS
    — the gates assert the full algorithmic shuffle inventory, which
    is what scales to 100 TB. (A repartition(n) applied directly to a
    corpus scan is plan-identical to the ingest rebalance and remains
    excluded; that shape IS an ingest rebalance wherever it comes
    from.)

    On an already-executed frame the simple plan prints Final AND
    Initial sections; only the Final (what actually ran) is counted."""
    plan = explain_str(df, "simple")
    if "== Final Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    lines = plan.splitlines()
    total = 0
    for i, line in enumerate(lines):
        if not re.search(r"\bExchange\b", line):
            continue
        if "REPARTITION_BY_NUM" in line:
            ingest = False
            for nxt in lines[i + 1 :]:
                if "FileScan" in nxt:
                    ingest = bool(_INGEST_SCAN_RE.search(nxt))
                    break
                if not _PASSTHROUGH_RE.search(nxt):
                    break  # join/agg/exchange below: not the ingest shape
            if ingest:
                continue
        total += 1
    return total


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
    EXECUTES the frame once to finalize it, via a JVM-side count over
    the SAME QueryExecution (a separate noop write would finalize a
    different QueryExecution and leave this one unfinalized; a collect
    would materialize the full result on the driver). Nothing crosses
    to the driver but per-partition counts; still a plan-audit helper
    for tests — don't call on production-sized frames."""
    plan = explain_str(df, "simple")
    found = set(re.findall(r"\*\((\d+)\)", plan))
    if not found and "AdaptiveSparkPlan" in plan:
        df._jdf.queryExecution().toRdd().count()
        found = set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple")))
    return len(found)


# First column prefix -> SF-proportional table it identifies in an
# analyzed-plan Relation line (nation/region are fixed-size and exempt).
_BIG_TABLE_PREFIXES = {
    "s_": "supplier",
    "c_": "customer",
    "p_": "part",
    "o_": "orders",
    "l_": "lineitem",
}
# Logical nodes that REDUCE rows between a hint and a scan — a
# broadcast hint above one of these pins a filtered/aggregated
# projection, not the raw table.
_ROW_REDUCING_RE = re.compile(
    r"\b(Filter|Aggregate|Join|GlobalLimit|LocalLimit|Deduplicate|Window|Intersect|Except)\b"
)
_RELATION_RE = re.compile(r"\bRelation\b[^\[]*\[([a-zA-Z_]+)")


def unreduced_big_table_broadcast_hints(df: DataFrame) -> list[str]:
    """SF-proportional tables pinned by an explicit broadcast hint with
    NO row-reducing node between the hint and the scan.

    This is the 100 TB hazard class the r5 verdict flagged on four
    TPC-H analogs: ``F.broadcast(supplier)`` is correct at sf0.1 and a
    multi-GB forced broadcast at a 100 TB scale factor. A hint over a
    Filter/Aggregate/... subtree is fine (it pins a reduced relation);
    broadcasting nation/region (fixed 25/5 rows) is fine; size-based
    planner/AQE broadcasts are fine (they re-decide per run). Returns
    the offending table names (with duplicates) for assertion messages.
    """
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()

    def content_offset(line: str) -> int:
        return len(line) - len(line.lstrip(":+- |"))

    offenders: list[str] = []
    for i, line in enumerate(lines):
        if "ResolvedHint (strategy=broadcast)" not in line:
            continue
        depth = content_offset(line)
        for sub in lines[i + 1 :]:
            if content_offset(sub) <= depth:
                break  # end of the hint's subtree
            if _ROW_REDUCING_RE.search(sub):
                break  # hint pins a reduced relation: fine
            m = _RELATION_RE.search(sub)
            if m:
                # reduced is necessarily False here: a reducing node
                # above would have broken out of the walk already
                table = _BIG_TABLE_PREFIXES.get(m.group(1)[:2])
                if table:
                    offenders.append(table)
                break  # a Relation ends this root-to-leaf spine
    return offenders
