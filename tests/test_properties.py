"""Property-based checks (hypothesis): the custom join rewrites must
equal their naive formulations on arbitrary small inputs — boundary
cases (equal timestamps, window edges, empty sides) that fixed
fixtures miss."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_kafka_filter_transform_spark.operators.asof import asof_join
from flink_kafka_filter_transform_spark.operators.rangejoin import range_join_bucketed

WINDOW = 10

_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),  # (key, ts)
    min_size=0,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_rows, right=_rows)
def test_range_join_bucketed_equals_naive(spark_prop, left, right):
    l_df = spark_prop.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key INT, l_ts INT, l_id INT"
    )
    r_df = spark_prop.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)], "key INT, r_ts INT, r_id INT"
    )
    got = {
        (r.l_id, r.r_id)
        for r in range_join_bucketed(
            l_df, r_df, key="key", left_ts="l_ts", right_ts="r_ts", window_us=WINDOW
        ).collect()
    }
    want = {
        (li, ri)
        for li, (lk, lt) in enumerate(left)
        for ri, (rk, rt) in enumerate(right)
        if lk == rk and lt - WINDOW < rt <= lt
    }
    assert got == want


_right_unique = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 40),
        st.one_of(st.none(), st.integers(-5, 5)),  # NULL values must carry
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, ts) as asof requires
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_rows, right=_right_unique)
def test_asof_join_equals_naive(spark_prop, left, right):
    l_df = spark_prop.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key INT, l_ts INT, l_id INT"
    )
    r_df = spark_prop.createDataFrame(
        [(k, t, v) for (k, t, v) in right], "key INT, r_ts INT, v INT"
    )
    got = {
        (r.l_id, r.asof_v)
        for r in asof_join(
            l_df, r_df, key="key", left_ts="l_ts", right_ts="r_ts", value_cols=["v"]
        ).collect()
    }
    want = set()
    for li, (lk, lt) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == lk and rt <= lt]
        want.add((li, max(cands)[1] if cands else None))
    assert got == want


_token_lists = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=10
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(toks=_token_lists, n=st.integers(2, 4))
def test_token_ngrams_equals_naive(spark_prop, toks, n):
    """The zip-shifted n-gram builder must equal the obvious windowed
    construction for any token list — including lists shorter than n
    (empty result, no crash: the sequence-counts-down regression)."""
    from flink_kafka_filter_transform_spark.operators.text import token_ngrams

    df = spark_prop.createDataFrame([(toks,)], "toks array<string>")
    got_all = df.select(token_ngrams(F.col("toks"), n, distinct=False).alias("g")).collect()[0].g
    got_distinct = df.select(token_ngrams(F.col("toks"), n).alias("g")).collect()[0].g
    want_all = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    assert got_all == want_all
    assert got_distinct == list(dict.fromkeys(want_all))  # order-preserving dedup
