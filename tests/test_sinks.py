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
