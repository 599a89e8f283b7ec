"""Pin down the regex-dialect boundary: Rust ``regex`` crate
(reference: /root/reference/src/config/transform.rs:33 compiles rule
patterns with Regex::new, matches with .is_match) vs Java
``java.util.regex`` behind Spark's ``rlike``.

Outcome of this audit, asserted below:

- IDENTICAL on the reference's own pattern families
  (transform.rs:136-153: literal prefixes + ``.*``, ``[0-9]+`` classes,
  ``^...$`` anchors, ``\\d``+ on ASCII input): both engines substring-
  match unanchored via is_match/rlike, honor explicit anchors, and
  agree on every ASCII input tested.
- DIVERGENT on non-ASCII digits: Rust's ``\\d`` is Unicode
  (matches e.g. Arabic-Indic U+0661), Java's ``\\d`` is ASCII-only
  unless UNICODE_CHARACTER_CLASS is set. A rule pattern using ``\\d``
  routes table ``t_١`` in the reference but NOT here. Mitigation:
  write ``[0-9]`` (identical in both dialects) — the reference's own
  shipped patterns already do.
- DIVERGENT on acceptance: Java accepts lookaround; Rust's regex crate
  REJECTS it at Regex::new, i.e. at config-load time. A lookaround
  rule the reference would refuse to boot with silently works here
  (strictly wider acceptance — documented, not a correctness bug).
"""

from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.operators import cdc

# (table_name, pattern, expected_under_java_rlike, note)
CASES = [
    # reference's own families (transform.rs:136-153) — ASCII: identical
    ("audit_2024", "audit.*", True, "prefix + .*"),
    ("pre_audit", "audit.*", True, "is_match/rlike are both UNANCHORED substring match"),
    ("table_123", "^table_[0-9]+$", True, "explicit anchors"),
    ("xtable_123", "^table_[0-9]+$", False, "anchor rejects prefix junk"),
    ("frame_77", "frame_[0-9]+", True, "digit class"),
    ("frame_x", "frame_[0-9]+", False, "digit class rejects non-digit"),
    ("table_123", r"table_\d+", True, r"\d on ASCII digits: identical"),
    # divergence 1: Unicode digits — Rust \d matches, Java \d does not
    ("table_١٢", r"table_\d+", False, r"Java \d is ASCII-only; Rust would MATCH"),
    ("table_١٢", "table_[0-9]+", False, "[0-9] is ASCII in BOTH dialects"),
    # divergence 2: lookahead — Java accepts; Rust rejects at compile
    ("table_9", r"table_(?=\d)\d", True, "lookaround works here; reference refuses the config"),
]


def test_rlike_dialect_matrix(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _, _) in enumerate(CASES)], "i int, table_name string"
    )
    checks = [
        F.when(F.col("i") == i, F.col("table_name").rlike(pat))
        for i, (_, pat, _, _) in enumerate(CASES)
    ]
    got = (
        df.select("i", F.coalesce(*checks).alias("m")).orderBy("i").collect()
    )
    for row, (tbl, pat, want, note) in zip(got, CASES):
        assert row.m == want, f"rlike({tbl!r}, {pat!r}) = {row.m}, want {want} ({note})"


def test_route_when_chain_honors_dialect(spark):
    """The same divergence surfaced through the actual routing operator:
    an ASCII table routes, the Unicode-digit twin falls through to no
    rule (the reference's Rust engine would route both)."""
    rules = [
        {"priority": 1, "source_topic": "t", "db": "d",
         "table_pattern": r"tab_\d+", "target_topic": "out"},
    ]
    df = spark.createDataFrame(
        [("t", "d", "tab_42"), ("t", "d", "tab_٤٢")],
        "topic string, db string, table_name string",
    )
    got = {
        r.table_name: r.target_topic
        for r in cdc.route_when_chain(df, rules).collect()
    }
    assert got["tab_42"] == "out"
    assert got["tab_٤٢"] is None  # Rust regex would say "out"


def test_levenshtein_dialect_ascii_only_contract(spark):
    """Cross-engine levenshtein contract (the linkage family's verify
    function): Spark's levenshtein counts CHARACTERS while DuckDB's
    counts BYTES — measured: levenshtein('café', 'cafe') = 1 in Spark,
    2 in DuckDB (é is two UTF-8 bytes). The two agree exactly on
    ASCII, which is why name_edit_neighbors' oracle is valid: the
    customer-name fixture is pure ASCII at every sf (asserted here on
    the test corpus), and linkage.edit_distance_pairs' docstring
    scopes the oracle contract to ASCII identifiers. A non-ASCII
    corpus diverges at the ORACLE, not the engine — Spark's
    char-based distance is the correct semantics (pinned below)."""
    import duckdb

    from flink_kafka_filter_transform_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR

    # 1. Spark's semantics are char-based (the correct ones)
    df = spark.createDataFrame([("café", "cafe")], "a STRING, b STRING")
    assert df.select(F.levenshtein("a", "b")).collect()[0][0] == 1
    # 2. DuckDB's are byte-based — the measured divergence this test
    # exists to document (if a DuckDB upgrade makes this 1, the
    # ASCII-only scoping below can be retired)
    con = duckdb.connect()
    assert con.sql("SELECT levenshtein('café', 'cafe')").fetchall()[0][0] == 2
    # 3. the fixture the oracle gates on is pure ASCII, so the
    # engines agree wherever the driver compares them
    non_ascii = (
        load_table(spark, "customer", SF_DIR)
        .filter(~F.col("c_name").rlike("^[\\x00-\\x7F]*$"))
        .count()
    )
    assert non_ascii == 0
