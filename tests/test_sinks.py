"""Lake-write layout checks: partition pruning must work on read-back."""

from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.plans import explain as px
from flink_kafka_filter_transform_spark.sinks import write_partitioned_parquet
from flink_kafka_filter_transform_spark.sources.parquet import load_table


def test_partitioned_write_round_trip(spark, sf_dir, tmp_path):
    events = load_table(spark, "events", sf_dir)
    out = str(tmp_path / "events_lake")
    write_partitioned_parquet(events, out, ["event_type"])

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # partition column survives with identical grouping
    a = sorted(map(tuple, events.groupBy("event_type").count().collect()))
    b = sorted(map(tuple, back.groupBy("event_type").count().collect()))
    assert a == b


def test_partition_pruning_on_read_back(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_lake2")
    write_partitioned_parquet(load_table(spark, "events", sf_dir), out, ["event_type"])
    q = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = px.explain_str(q)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0]


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Co-bucketed tables sort-merge join with no Exchange at all."""
    from flink_kafka_filter_transform_spark.sinks import write_bucketed_table

    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    write_bucketed_table(orders, "b_orders", str(tmp_path / "bo"), ["o_custkey"])
    write_bucketed_table(customer, "b_customer", str(tmp_path / "bc"), ["c_custkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_customer"), F.col("o_custkey") == F.col("c_custkey")
        )
        assert px.count_shuffles(j) == 0, px.explain_str(j, "simple")
        assert px.sortmerge_join_count(j) == 1
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
