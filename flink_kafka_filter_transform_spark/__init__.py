"""PySpark-native analytics engine with the capabilities of
liuruishan-2022/flink-kafka-filter-transform, re-expressed Spark-first.

The reference (/root/reference, Rust, 532 LoC) is a Kafka CDC
parse -> filter -> regex-route -> produce pipeline with two running
grouped counters (see SURVEY.md). This package provides:

- ``sources``    : parquet table registry, Kafka & file-stream builders
- ``operators``  : CDC parity operators (parse/filter/route/count) plus
                   the large-scale extension surface (dedup, similarity
                   search, text analysis, multimodal plumbing, relational)
- ``functions``  : portable deterministic hashing, vector math, JSON helpers
- ``plans``      : plan-inspection utilities (broadcast/pushdown asserts)
- ``streaming``  : Structured Streaming wrappers for the CDC pipeline

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, broadcast selection and AQE; Python UDFs appear only in the
multimodal decode stubs (Arrow-batched ``mapInPandas``).
"""

from flink_kafka_filter_transform_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
