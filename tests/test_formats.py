"""Multi-format ingestion tests: CSV / JSON-lines / ORC / text round-
trips against the parquet ground truth, plus malformed-row quarantine."""

from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.sources import formats as fmt
from flink_kafka_filter_transform_spark.sources.parquet import load_table


def _orders_subset(spark, sf_dir):
    return load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )


def _assert_same_rows(a, b):
    """Full multiset equality over ALL columns (not just key
    membership — a value-mangling roundtrip must fail here)."""
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
    assert a.count() == b.count()


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = _orders_subset(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    src.write.option("header", True).csv(path)
    back = fmt.read_csv(spark, path, src.schema)
    with fmt.quarantine_split(back) as (clean, bad):
        assert bad.count() == 0
        _assert_same_rows(clean, src)
        assert clean.schema["o_totalprice"].dataType == src.schema["o_totalprice"].dataType
    assert back.storageLevel.useMemory is False  # cache released on exit


def test_jsonl_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    src = _orders_subset(spark, sf_dir).limit(100)
    path = str(tmp_path / "orders_jsonl")
    src.write.json(path)
    # drop a poison file with malformed lines into the dataset dir
    with open(f"{path}/part-99999-poison.json", "w") as f:
        f.write('{"o_orderkey": broken\nnot json at all\n')
    back = fmt.read_jsonl(spark, path, src.schema)
    with fmt.quarantine_split(back) as (clean, bad):
        assert bad.count() == 2  # both malformed lines quarantined, job alive
        _assert_same_rows(clean, src)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from flink_kafka_filter_transform_spark.plans import explain as px

    src = _orders_subset(spark, sf_dir)
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)
    back = fmt.read_orc(spark, path)
    _assert_same_rows(back, src)
    q = back.filter(F.col("o_orderkey") == 1).select("o_orderkey", "o_totalprice")
    assert any("o_orderkey" in f for f in px.pushed_filters(q)), px.pushed_filters(q)
    assert px.scan_reads_only(q, {"o_orderkey", "o_totalprice"})


def test_text_corpus(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    path = str(tmp_path / "corpus_txt")
    docs.select(F.regexp_replace("text", "\n", " ").alias("value")).write.text(path)
    corpus = fmt.read_text_corpus(spark, path)
    assert corpus.count() == 50
    assert corpus.filter(F.col("source_file").contains("corpus_txt")).count() == 50
    assert corpus.schema.fieldNames() == ["source_file", "line"]
