"""O11 — runtime config load + rule compilation.

Mirrors FlinkKafkaTransform at
/root/reference/src/config/transform.rs:4-10 and the YAML shape of
/root/reference/config.yaml: kafka connection (bootstrap_servers,
group, bindings = subscribed topics) plus an ordered ``transforms``
rule list. The reference pre-compiles every ``table`` regex at startup
(transform.rs:26-38) and fails fast on a bad pattern — here the same
validation happens at load time with Python ``re`` (a superset of the
dialect used by Spark's rlike for these patterns), and the *plan-time*
compilation happens when the when-chain folds the literal patterns
into codegen.

Rule order in the file IS the priority (first match wins,
transform.rs:57-64), so ``priority`` is assigned from position.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class KafkaConfig:
    bootstrap_servers: str
    group: str
    bindings: list[str] = field(default_factory=list)


@dataclass
class EngineConfig:
    kafka: KafkaConfig
    rules: list[dict]


def compile_rules(transforms: list[dict]) -> list[dict]:
    """Validate + order the rule table; raises on an invalid regex
    (startup fail-fast parity with transform.rs:33 .unwrap())."""
    rules = []
    for i, t in enumerate(transforms):
        missing = {"source_topic", "db", "table", "target_topic"} - set(t)
        if missing:
            raise ValueError(f"transform #{i}: missing keys {sorted(missing)}")
        try:
            re.compile(t["table"])
        except re.error as e:
            raise ValueError(f"transform #{i}: bad table pattern {t['table']!r}: {e}") from e
        rules.append(
            {
                "priority": i + 1,
                "source_topic": t["source_topic"],
                "db": t["db"],
                "table_pattern": t["table"],
                "target_topic": t["target_topic"],
            }
        )
    return rules


def load_config(path: str) -> EngineConfig:
    """Parse a reference-format config.yaml into an EngineConfig."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    k = raw.get("kafka", {})
    return EngineConfig(
        kafka=KafkaConfig(
            bootstrap_servers=k.get("bootstrap_servers", ""),
            group=k.get("group", ""),
            bindings=list(k.get("bindings", [])),
        ),
        rules=compile_rules(raw.get("transforms", [])),
    )
