"""Custom stateful streaming: process-lifetime monotone counters.

The reference's Prometheus counters (src/mq/mod.rs:35-59) are
unkeyed-by-time monotone state. Spark's built-in streaming groupBy
covers the semantics (streaming/pipeline.py); this module shows the
*custom-operator* escape hatch — ``applyInPandasWithState`` — for
stateful logic the built-ins can't express (per-key state machines,
custom eviction, session carryover).

State is partitioned by group key, so the operator scales exactly like
a streaming aggregation: state rows live in the state store shuffled
by key; Arrow batches cross the Python boundary per key-partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUTPUT_SCHEMA = "target_topic STRING, op STRING, total BIGINT"
COUNTER_STATE_SCHEMA = "total BIGINT"


def _update_counter(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate a monotone per-(target_topic, op) count across
    micro-batches — the flink_kafka_filter_transform_count analog that
    survives as managed, checkpointed state (stronger than the
    reference's process-lifetime counters, SURVEY §7 risk register)."""
    (total,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"target_topic": [key[0]], "op": [key[1]], "total": [total]})


def running_counters(routed: DataFrame) -> DataFrame:
    """Streaming running counters over the routed stream.

    Input: the post-route stream with (target_topic, op) columns."""
    return routed.groupBy("target_topic", "op").applyInPandasWithState(
        _update_counter,
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
