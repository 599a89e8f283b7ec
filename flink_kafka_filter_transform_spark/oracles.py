"""DuckDB oracle SQL builders — the differential-testing twin of every
operator in the engine.

Each builder returns ANSI-ish SQL that DuckDB runs over the driver's
pre-registered parquet views, reproducing the Spark query's semantics
(and, for floating point, its exact fold order — see functions.vectors).
The driver compares row count + schema + order-insensitive value hash
at sf0.01 (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from flink_kafka_filter_transform_spark.sources.cdc_fixture import RULES, cdc_sql, rules_cte_sql

# ---------------------------------------------------------------------------
# CDC parity oracles
# ---------------------------------------------------------------------------

# JSON-parse twin of operators.cdc.parse_envelope: DuckDB raises on
# invalid JSON, so guard with json_valid (Spark's from_json is
# null-on-malformed by construction).
_PARSED_CTE = """
parsed AS (
  SELECT
    msg_id, topic, key, value, ts,
    CASE WHEN value IS NOT NULL AND json_valid(value)
         THEN json_extract_string(value, '$.op') END AS op,
    CASE WHEN value IS NOT NULL AND json_valid(value)
         THEN json_extract_string(value, '$.source.db') END AS db,
    CASE WHEN value IS NOT NULL AND json_valid(value)
         THEN json_extract_string(value, '$.source.table') END AS table_name
  FROM cdc
)
"""


def _with_cdc(body: str) -> str:
    return f"WITH cdc AS ({cdc_sql('duckdb')}),\n{_PARSED_CTE}\n{body}"


def route_case_sql() -> str:
    """First-match-wins routing as an ordered CASE (DuckDB dialect)."""
    whens = "\n    ".join(
        f"WHEN topic = '{r['source_topic']}' AND db = '{r['db']}' "
        f"AND regexp_matches(table_name, '{r['table_pattern']}') THEN '{r['target_topic']}'"
        for r in sorted(RULES, key=lambda r: r["priority"])
    )
    return f"CASE\n    {whens}\n  END"


def cdc_parse_oracle() -> str:
    return _with_cdc(
        "SELECT msg_id, op, db, table_name, op IS NOT NULL AS parse_ok FROM parsed"
    )


def cdc_filter_deletes_oracle() -> str:
    return _with_cdc(
        "SELECT msg_id, topic, key, op, db, table_name FROM parsed "
        "WHERE op IS NOT NULL AND op <> 'd'"
    )


def cdc_route_oracle() -> str:
    return _with_cdc(
        f"""
SELECT msg_id, topic, db, table_name, op, target_topic FROM (
  SELECT *, {route_case_sql()} AS target_topic
  FROM parsed WHERE op IS NOT NULL AND op <> 'd'
) routed WHERE target_topic IS NOT NULL
"""
    )


def cdc_route_join_oracle() -> str:
    """Join-based routing twin: min-priority match per message."""
    return _with_cdc(
        f"""
SELECT msg_id, topic, db, table_name, op, target_topic FROM (
  SELECT p.msg_id, p.topic, p.db, p.table_name, p.op, r.target_topic,
         row_number() OVER (PARTITION BY p.msg_id ORDER BY r.priority) AS rn
  FROM (SELECT * FROM parsed WHERE op IS NOT NULL AND op <> 'd') p
  JOIN ({rules_cte_sql()}) r
    ON p.topic = r.source_topic AND p.db = r.db
   AND regexp_matches(p.table_name, r.table_pattern)
) m WHERE rn = 1
"""
    )


def cdc_counts_inbound_oracle() -> str:
    return _with_cdc(
        "SELECT topic, db, table_name, op, count(*) AS cnt FROM parsed "
        "GROUP BY topic, db, table_name, op"
    )


def cdc_counts_outbound_oracle() -> str:
    return _with_cdc(
        f"""
SELECT target_topic, op, count(*) AS cnt FROM (
  SELECT *, {route_case_sql()} AS target_topic
  FROM parsed WHERE op IS NOT NULL AND op <> 'd'
) routed WHERE target_topic IS NOT NULL
GROUP BY target_topic, op
"""
    )


def cdc_outgoing_oracle() -> str:
    """O7 passthrough: outgoing (topic, key, value) — payload verbatim."""
    return _with_cdc(
        f"""
SELECT target_topic AS topic, key, value FROM (
  SELECT *, {route_case_sql()} AS target_topic
  FROM parsed WHERE op IS NOT NULL AND op <> 'd'
) routed WHERE target_topic IS NOT NULL
"""
    )
