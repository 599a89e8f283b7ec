"""O11 config load/compile tests (transform.rs:15-38 parity)."""

import pytest

from flink_kafka_filter_transform_spark.operators import cdc
from flink_kafka_filter_transform_spark.sources.config import compile_rules, load_config

CONFIG_YAML = """\
kafka:
  bootstrap_servers: "localhost:9092"
  group: "flink-kafka-filter-transform"
  bindings:
    - "flink-1"
    - "flink-2"
transforms:
  - source_topic: "flink-1"
    db: "db_1"
    table: "gsms_msg_ticket_sms_[0-9]+"
    target_topic: "sms-topic"
  - source_topic: "flink-1"
    db: "db_1"
    table: "table_1"
    target_topic: "table-1-topic"
"""


@pytest.fixture()
def config_path(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(CONFIG_YAML)
    return str(p)


def test_load_config(config_path):
    cfg = load_config(config_path)
    assert cfg.kafka.bootstrap_servers == "localhost:9092"
    assert cfg.kafka.bindings == ["flink-1", "flink-2"]
    assert [r["priority"] for r in cfg.rules] == [1, 2]
    assert cfg.rules[0]["table_pattern"] == "gsms_msg_ticket_sms_[0-9]+"


def test_bad_regex_fails_fast():
    with pytest.raises(ValueError, match="bad table pattern"):
        compile_rules(
            [{"source_topic": "t", "db": "d", "table": "[unclosed", "target_topic": "x"}]
        )


def test_missing_key_fails():
    with pytest.raises(ValueError, match="missing keys"):
        compile_rules([{"source_topic": "t", "db": "d", "target_topic": "x"}])


def test_loaded_rules_drive_routing(spark, config_path):
    """End-to-end: YAML rules -> when-chain -> routed rows.

    Regex-edge fixtures from transform.rs:134-154: unanchored match on
    digit-suffixed table names; no-match rows silently dropped."""
    cfg = load_config(config_path)
    df = spark.createDataFrame(
        [
            (1, "flink-1", "db_1", "gsms_msg_ticket_sms_1009", "c"),
            (2, "flink-1", "db_1", "gsms_msg_frame_0908", "c"),
            (3, "flink-1", "db_1", "table_1", "c"),
            (4, "flink-2", "db_1", "gsms_msg_ticket_sms_1009", "c"),
        ],
        "msg_id INT, topic STRING, db STRING, table_name STRING, op STRING",
    )
    routed = cdc.drop_unrouted(cdc.route_when_chain(df, cfg.rules))
    got = {(r["msg_id"], r["target_topic"]) for r in routed.collect()}
    assert got == {(1, "sms-topic"), (3, "table-1-topic")}
