"""Real-broker Kafka integration tests — O1 (source) and O8 (sink).

No broker exists in this container, so these SKIP unless
``SPARK_GRAFT_KAFKA_BOOTSTRAP`` is set (e.g. ``localhost:9092``). The
file-stream twin in test_streaming.py covers the identical downstream
lineage; what only a broker can exercise is the Kafka source schema
mapping, consumer options (earliest offsets, session.timeout 6000 —
reference kafka.rs:33-34), and the per-row topic-column sink routing
(kafka.rs:80-82). If a broker ever appears in the environment, these
light up with no code change.

The test uses the reference's REAL topic names (flink-1/flink-2,
config.yaml:5-6) because the rule table keys on them, and it reads
routed topics from EARLIEST offsets — so it requires a FRESH broker
(empty topics) and is exact only on its first run; a rerun against the
same broker accumulates prior output and fails the count equality.
Point SPARK_GRAFT_KAFKA_BOOTSTRAP at a disposable test broker.

Note: Spark's Kafka connector is a separate artifact
(spark-sql-kafka-0-10); when absent the tests skip on that too.
"""

import os

import pytest

from flink_kafka_filter_transform_spark.operators import cdc
from flink_kafka_filter_transform_spark.sources.cdc_fixture import RULES, cdc_events_df
from flink_kafka_filter_transform_spark.streaming import pipeline as sp

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker in sandbox)"
)


def _kafka_available(spark) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def test_roundtrip_source_transform_sink(spark, sf_dir, tmp_path):
    """Seed flink-1/flink-2 with the CDC fixture (per-row topic column
    on the batch Kafka write — the same O8 mechanism), run the full
    O1->O8 streaming path, and read the routed topics back: per-topic
    counts must equal the batch pipeline's outbound counts."""
    if not _kafka_available(spark):
        pytest.skip("spark-sql-kafka connector not on classpath")

    from pyspark.sql import functions as F

    fixture = cdc_events_df(spark, sf_dir)
    (
        fixture.filter(F.col("value").isNotNull())
        .select(
            "topic",
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .save()
    )

    kafka = sp.kafka_stream_source(spark, BOOTSTRAP, ["flink-1", "flink-2"])
    stream = kafka.select(
        "topic", F.col("key").cast("string"), F.col("value").cast("string")
    )
    out = sp.transformed_stream(stream, RULES)
    q = (
        sp.kafka_sink(out, BOOTSTRAP, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    routed_topics = sorted({r["target_topic"] for r in RULES})
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", ",".join(routed_topics))
        .option("startingOffsets", "earliest")
        .load()
    )
    got = {
        (r["topic"], r["cnt"])
        for r in back.groupBy("topic").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    want = {
        (r["target_topic"], r["cnt"])
        for r in cdc.cdc_pipeline(fixture, RULES)
        .groupBy("target_topic")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .collect()
    }
    assert got == want and len(want) > 0
