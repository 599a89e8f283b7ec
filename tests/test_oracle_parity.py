"""Differential gate: every queries() entry vs its oracle_sql() twin.

This mirrors exactly what the driver runs at sf0.01; locally we run
sf0.001 for speed (set SPARK_GRAFT_TEST_SF_DIR to override)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_util import compare_exact

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    compare_exact(df, ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
