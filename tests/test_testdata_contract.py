"""Testdata physical-schema contract: the driver regenerates
/root/testdata between rounds and its generator is not versioned with
this repo, so physical-type assumptions rot silently — in round 4,
events.ts changed from TIMESTAMP(NANOS) (read as bigint under
nanosAsLong) to TIMESTAMP(us) (read as TIMESTAMP_NTZ) and broke every
`ts DIV 1000` site at analysis time. These tests turn the next such
drift into a loud, early, NAMED failure instead of 50 red driver rows.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

# Logical column contract per table: (column, allowed pyarrow type
# prefixes). Prefix matching absorbs harmless width changes
# (timestamp[us] vs timestamp[ns]; int32 vs int64 is NOT absorbed —
# a width flip there changes Spark dtypes and driver schema hashes).
EXPECTED = {
    "region": {"r_regionkey": ("int32",), "r_name": ("string", "large_string")},
    "nation": {"n_nationkey": ("int32",), "n_name": ("string", "large_string"), "n_regionkey": ("int32",)},
    "customer": {"c_custkey": ("int64",), "c_nationkey": ("int32",), "c_acctbal": ("double",), "c_mktsegment": ("string", "large_string")},
    "supplier": {"s_suppkey": ("int64",), "s_nationkey": ("int32",), "s_acctbal": ("double",)},
    "part": {"p_partkey": ("int64",), "p_size": ("int32",), "p_retailprice": ("double",)},
    "orders": {"o_orderkey": ("int64",), "o_custkey": ("int64",), "o_totalprice": ("double",), "o_orderdate": ("timestamp",)},
    "lineitem": {"l_orderkey": ("int64",), "l_linenumber": ("int32",), "l_quantity": ("double",), "l_shipdate": ("timestamp",)},
    "events": {"event_id": ("int64",), "user_id": ("int64",), "value": ("double",), "props": ("string", "large_string")},
    "documents": {"doc_id": ("int64",), "text": ("string", "large_string"), "n_chars": ("int64",)},
    "embeddings": {"vec_id": ("int64",), "label": ("int32",)},
}

# events.ts is special: BOTH encodings the driver has shipped are
# legal, because sources.parquet.ts_as_* normalizes either. Anything
# else is a new third encoding and must fail loudly here.
TS_ALLOWED_PREFIXES = ("timestamp[us", "timestamp[ns", "timestamp[ms", "int64")


def _sf_dirs():
    return sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", _sf_dirs())
def test_tables_exist_with_expected_columns(sf_dir):
    for table, cols in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        assert os.path.exists(path), f"{table} missing at {sf_dir}"
        schema = pq.read_schema(path)
        for col, prefixes in cols.items():
            assert col in schema.names, f"{sf_dir}/{table}: column {col} gone"
            t = str(schema.field(col).type)
            assert t.startswith(prefixes), (
                f"{sf_dir}/{table}.{col}: physical type {t!r} drifted "
                f"outside {prefixes} — audit every consumer before trusting "
                f"green tests (see round-4 events.ts migration)"
            )


@pytest.mark.parametrize("sf_dir", _sf_dirs())
def test_events_ts_encoding_is_handled(sf_dir):
    t = str(pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type)
    assert t.startswith(TS_ALLOWED_PREFIXES), (
        f"events.ts physical type {t!r} is a NEW encoding: extend "
        f"sources.parquet.ts_as_timestamp/ts_as_micros (and this test) "
        f"before anything else this round"
    )


def test_embeddings_are_float_lists():
    for sf_dir in _sf_dirs():
        t = str(pq.read_schema(os.path.join(sf_dir, "embeddings.parquet")).field("embedding").type)
        assert "float" in t or "double" in t, f"{sf_dir}: embedding element type drifted: {t!r}"
