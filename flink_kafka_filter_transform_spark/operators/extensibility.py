"""User-extensibility surface: pandas grouped-aggregate UDF + Python UDTF.

The reference has ZERO extensibility hooks (SURVEY §2.2 — the config
regex is the only user-programmable behavior). A real engine needs
user-defined aggregates and table functions; these two are the
Arrow-batched patterns a user would copy:

- ``weighted_avg_by_type``: a grouped-map ``applyInPandas`` aggregate.
  The Python boundary is crossed once per GROUP with an Arrow batch,
  not once per row — the only acceptable UDF shape in a hot path.
- ``sentence_split``: a Python UDTF (table function) exploding each
  document into numbered sentence rows — the lateral-view shape for
  per-row fan-out logic Catalyst can't express.

Both are ORACLE-CHECKED, which forces the determinism discipline
user UDFs usually skip: the pandas aggregate folds values
SEQUENTIALLY in explicit event_id order (numpy's pairwise sum and
shuffle-order accumulation would both diverge from any SQL engine);
the UDTF's regex split is mirrored by DuckDB string ops.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _weighted_avg_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group: sum(value*k) / sum(k), folded left in event_id order.

    Sequential left-fold over sorted rows == DuckDB's list_reduce over
    a list() ORDER BY event_id — bit-identical, unlike np.sum."""
    pdf = pdf.sort_values("event_id")
    num = 0.0
    den = 0.0
    for v, k in zip(pdf["value"].to_numpy(), pdf["k"].to_numpy()):
        num = num + v * k
        den = den + k
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "weighted_avg_value": [num / den if den != 0.0 else None],
            "n_weighted": [len(pdf)],
        }
    )


def weighted_avg_by_type(events: DataFrame) -> DataFrame:
    """Grouped pandas aggregate: k-weighted mean event value per type
    (k extracted from the props JSON; rows without k are excluded)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    src = events.select("event_type", "event_id", "value", k.alias("k")).filter(
        F.col("k").isNotNull()
    )
    return src.groupBy("event_type").applyInPandas(
        _weighted_avg_group,
        schema="event_type string, weighted_avg_value double, n_weighted bigint",
    )


_SENTENCE_RE = re.compile(r"[^.!?]+[.!?]?")
# Explicit edge-trim char class shared with the oracle: Python's \s
# (even with re.ASCII) includes \v, RE2's does not, and str.strip()
# eats unicode whitespace — an enumerated class is the only set both
# engines agree on. Keep in sync with EDGE_WS_CLASS in oracles.py.
EDGE_WS_CLASS = "[ \\t\\n\\f\\r]"
_EDGE_WS_RE = re.compile(f"^{EDGE_WS_CLASS}+|{EDGE_WS_CLASS}+$")


def sentence_split_rows(docs: DataFrame) -> DataFrame:
    """UDTF surface: explode documents into (doc_id, sentence_idx,
    sentence, n_chars) rows via a Python table function."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="sentence_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str) -> Iterator[tuple]:
            if text is None:
                return
            idx = 0
            for m in _SENTENCE_RE.finditer(text):
                s = _EDGE_WS_RE.sub("", m.group(0))
                if s:
                    yield (idx, s, len(s))
                    idx += 1

    docs.createOrReplaceTempView("_udtf_docs")
    spark = docs.sparkSession
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        "SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_chars "
        "FROM _udtf_docs d, LATERAL sentence_split(d.text) s"
    )
