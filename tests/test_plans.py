"""Physical-plan quality gates: scale discipline as assertions.

These tests encode the 100 TB design review: stateless CDC path must
be shuffle-free, dimension joins must broadcast, scans must prune and
push down. A change that silently degrades the plan fails here even
when results stay correct."""

from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.operators import cdc, relational, similarity
from flink_kafka_filter_transform_spark.plans import explain as px
from flink_kafka_filter_transform_spark.sources.cdc_fixture import RULES, cdc_events_df, rules_df
from flink_kafka_filter_transform_spark.sources.parquet import load_table


def test_route_when_chain_is_shuffle_free(spark, sf_dir):
    """parse -> filter -> route -> project is a pure map pipeline: zero
    Exchange, fully codegen'd — the property that makes it scale
    linearly with input splits."""
    df = cdc.project_outgoing(
        cdc.drop_unrouted(
            cdc.route_when_chain(
                cdc.filter_deletes(cdc.parse_envelope(cdc_events_df(spark, sf_dir))), RULES
            )
        )
    )
    assert px.count_shuffles(df) == 0
    assert px.codegen_stage_count(df) >= 1


def test_route_broadcast_join_broadcasts(spark, sf_dir):
    df = cdc.route_broadcast_join(
        cdc.filter_deletes(cdc.parse_envelope(cdc_events_df(spark, sf_dir))), rules_df(spark)
    )
    assert px.has_broadcast_join(df)
    assert px.sortmerge_join_count(df) == 0


def test_q1_scan_prunes_and_pushes(spark, sf_dir):
    df = relational.q1_pricing_summary(load_table(spark, "lineitem", sf_dir))
    needed = {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    assert px.scan_reads_only(df, needed), px.read_schemas(df)
    assert any("l_shipdate" in f for f in px.pushed_filters(df)), px.pushed_filters(df)


def test_q5_dimension_joins_broadcast(spark, sf_dir):
    df = relational.q5_local_supplier_volume(
        load_table(spark, "region", sf_dir),
        load_table(spark, "nation", sf_dir),
        load_table(spark, "customer", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "supplier", sf_dir),
    )
    assert px.broadcast_join_count(df) >= 3
    assert px.sortmerge_join_count(df) == 0


def test_knn_brute_broadcasts_queries(spark, sf_dir):
    df = similarity.knn_brute(load_table(spark, "embeddings", sf_dir))
    assert px.has_broadcast_join(df)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, "events", sf_dir).filter(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    assert any("event_type" in f for f in px.pushed_filters(df))
    assert px.scan_reads_only(df, {"event_id", "value", "event_type"})
