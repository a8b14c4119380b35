"""Every oracle-covered query must hash-match DuckDB at sf0.01 — the same
gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    compare(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_ORACLE)
        assert df.count() >= 0
        assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["node_id", "pk", "c_acctbal", "degree"]
