"""Every oracle-covered query must hash-match DuckDB at sf0.01 — the same
gate the driver applies (CORRECTNESS_r{N}.json).

Wall-time split (optimization round 13, r12 verdict item 3 — the full
pytest suite must finish inside the driver's verification window): the
~10 trainer/stream/index rows below each cost 10-45 s of REAL training
or micro-batch streaming, ~replicating the driver's own per-round
sweep of the same names (tools/sweep.py runs every one of them against
the same oracles each round, so the correctness gate itself loses
nothing). They run here only when SPARK_GRAFT_FULL_PARITY=1; the other
~115 parity rows always run. `python tools/sweep.py` remains the
everything-always surface for local development."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

#: the measured >=10 s parity rows (real GNN training epochs, the
#: six-tier index build, the micro-batch streaming drains)
HEAVY = {
    "recommend_gnn", "hetero_forward_q", "hetero_link_train_sampled_q",
    "gat_stack_train_q", "gat_stack_train_sampled_q",
    "ann_index_variants", "stream_variants", "cdc_stream",
}
#: rows-only trainer slots with the same cost profile
HEAVY_ROWS_ONLY = {
    "hetero_forward", "hetero_link_train", "hetero_link_train_sampled",
    "gat_stack_train_variants",
}
FULL = os.environ.get("SPARK_GRAFT_FULL_PARITY") == "1"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    if name in HEAVY and not FULL:
        pytest.skip("heavy trainer/stream row — driver sweep covers it; "
                    "set SPARK_GRAFT_FULL_PARITY=1 to run here")
    compare(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        if name in HEAVY_ROWS_ONLY and not FULL:
            continue
        df = QUERIES[name](spark, SF_ORACLE)
        assert df.count() >= 0
        assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["node_id", "pk", "c_acctbal", "degree"]
