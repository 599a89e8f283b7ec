from flink_kafka_filter_transform_spark.functions.hashing import portable_hash64
from flink_kafka_filter_transform_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["portable_hash64", "cosine_similarity", "dot", "l2_norm"]
