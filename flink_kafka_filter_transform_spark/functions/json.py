"""Debezium envelope schema + null-safe parse expression.

Mirrors the partial schema-on-read of the reference: serde deserializes
ONLY ``op`` and ``source.{db,table}`` and ignores every other field
(/root/reference/src/mq/kafka.rs:119-143). ``from_json`` has the same
ignore-undeclared-fields semantics, and since SPARK-32958 Catalyst
prunes unparsed fields from the JSON parser itself.

Divergence by design: the reference panics on null/malformed payloads
(kafka.rs:53-55 ``.unwrap()``); here a malformed payload parses to a
null struct and flows to a counted discard (SURVEY §3.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

ENVELOPE_SCHEMA = StructType(
    [
        StructField("op", StringType()),
        StructField(
            "source",
            StructType(
                [
                    StructField("db", StringType()),
                    StructField("table", StringType()),
                ]
            ),
        ),
    ]
)


def parse_envelope_col(value: Column | str) -> Column:
    """Parse the envelope bytes/string into a struct<op, source<db,table>>."""
    c = F.col(value) if isinstance(value, str) else value
    return F.from_json(c.cast("string"), ENVELOPE_SCHEMA)
