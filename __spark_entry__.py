"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine code lives in ``flink_kafka_filter_transform_spark``; this file
only wires queries to oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_kafka_filter_transform_spark import oracles
from flink_kafka_filter_transform_spark.operators import cdc
from flink_kafka_filter_transform_spark.sources.cdc_fixture import RULES, cdc_events_df, rules_df

QueryFn = Callable[[SparkSession, str], DataFrame]


# ---------------------------------------------------------------------------
# CDC parity queries (SURVEY.md §2 O2-O10) over the deterministic CDC
# fixture derived from the events table (sources.cdc_fixture).
# ---------------------------------------------------------------------------


def _cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_events_df(spark, sf_dir)


def q_cdc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cdc.parse_envelope(_cdc(spark, sf_dir))
    return df.select("msg_id", "op", "db", "table_name", "parse_ok")


def q_cdc_filter_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cdc.filter_deletes(cdc.parse_envelope(_cdc(spark, sf_dir)))
    return df.select("msg_id", "topic", "key", "op", "db", "table_name")


def q_cdc_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cdc.route_when_chain(cdc.filter_deletes(cdc.parse_envelope(_cdc(spark, sf_dir))), RULES)
    return cdc.drop_unrouted(df).select("msg_id", "topic", "db", "table_name", "op", "target_topic")


def q_cdc_route_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cdc.route_broadcast_join(
        cdc.filter_deletes(cdc.parse_envelope(_cdc(spark, sf_dir))), rules_df(spark)
    )
    return df.select("msg_id", "topic", "db", "table_name", "op", "target_topic")


def q_cdc_counts_inbound(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.inbound_counts(cdc.parse_envelope(_cdc(spark, sf_dir)))


def q_cdc_counts_outbound(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.cdc_pipeline(_cdc(spark, sf_dir), RULES)


def q_cdc_outgoing(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = cdc.drop_unrouted(
        cdc.route_when_chain(cdc.filter_deletes(cdc.parse_envelope(_cdc(spark, sf_dir))), RULES)
    )
    return cdc.project_outgoing(routed)


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full data path (parse -> filter ->
    route -> outbound counts) over sf0.001."""
    return q_cdc_counts_outbound(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return {
        "cdc_parse": q_cdc_parse,
        "cdc_filter_deletes": q_cdc_filter_deletes,
        "cdc_route": q_cdc_route,
        "cdc_route_join": q_cdc_route_join,
        "cdc_counts_inbound": q_cdc_counts_inbound,
        "cdc_counts_outbound": q_cdc_counts_outbound,
        "cdc_outgoing": q_cdc_outgoing,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_parse": oracles.cdc_parse_oracle(),
        "cdc_filter_deletes": oracles.cdc_filter_deletes_oracle(),
        "cdc_route": oracles.cdc_route_oracle(),
        "cdc_route_join": oracles.cdc_route_join_oracle(),
        "cdc_counts_inbound": oracles.cdc_counts_inbound_oracle(),
        "cdc_counts_outbound": oracles.cdc_counts_outbound_oracle(),
        "cdc_outgoing": oracles.cdc_outgoing_oracle(),
    }
