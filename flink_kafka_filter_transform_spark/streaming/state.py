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
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

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


# ---------------------------------------------------------------------------
# Streaming first-seen dedup: per content hash, keep (first_doc_id,
# n_copies) in keyed state and emit the revised ledger row each time
# the key is touched. This is exact corpus dedup running
# INCREMENTALLY: state is the dedup ledger, shuffled by hash exactly
# like the batch groupBy, so a 100 TB backfill and the steady-state
# stream use the same partitioning and the same ledger. The winner is
# the SMALLEST doc_id (the batch min-survivor convention), so late or
# replayed micro-batches can never flip WHO WON — first_doc_id is a
# min, idempotent under replay. n_copies/n_suppressed are per-row
# increments and are replay-idempotent only as far as the source's
# exactly-once delivery (file-stream checkpointing here); an
# at-least-once source would double-count suppressions.
# ---------------------------------------------------------------------------

FIRSTSEEN_OUTPUT_SCHEMA = "content_hash BIGINT, first_doc_id BIGINT, n_suppressed BIGINT"
FIRSTSEEN_STATE_SCHEMA = "first_doc_id BIGINT, n_copies BIGINT"


def _update_first_seen(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    first_doc, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            n += 1
            if first_doc is None or d < first_doc:
                first_doc = d
    state.update((first_doc, n))
    yield pd.DataFrame(
        {
            "content_hash": [int(key[0])],
            "first_doc_id": [first_doc],
            "n_suppressed": [n - 1],
        }
    )


def streaming_first_seen(hashed: DataFrame) -> DataFrame:
    """First-seen dedup ledger over a stream of (content_hash, doc_id)
    rows: emits, per touched hash, the surviving doc and how many
    duplicates it has suppressed so far. Output mode 'update' — each
    micro-batch revises only the touched keys."""
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _update_first_seen,
        outputStructType=FIRSTSEEN_OUTPUT_SCHEMA,
        stateStructType=FIRSTSEEN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _FirstSeenProcessor(StatefulProcessor):
    """The same ledger on Spark 4's transformWithStateInPandas (typed
    ValueState, the successor API). ENVIRONMENT GATE: the TWS state
    protocol needs google.protobuf, which this container lacks — the
    test auto-skips when the import is missing (same pattern as the
    Kafka broker test); semantics are pinned by the
    applyInPandasWithState twin above either way."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("firstseen", FIRSTSEEN_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        first_doc, n = (
            tuple(self._state.get()) if self._state.exists() else (None, 0)
        )
        for pdf in rows:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n += 1
                if first_doc is None or d < first_doc:
                    first_doc = d
        self._state.update((first_doc, n))
        yield pd.DataFrame(
            {
                "content_hash": [int(key[0])],
                "first_doc_id": [first_doc],
                "n_suppressed": [n - 1],
            }
        )

    def close(self) -> None:
        pass


def streaming_first_seen_tws(hashed: DataFrame) -> DataFrame:
    """transformWithStateInPandas variant of streaming_first_seen —
    see _FirstSeenProcessor for the environment gate."""
    return hashed.groupBy("content_hash").transformWithStateInPandas(
        _FirstSeenProcessor(),
        outputStructType=FIRSTSEEN_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
