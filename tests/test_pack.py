"""Token packing — span correctness, conservation, determinism, and the
no-total-sort plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.pack import chunk_fill, pack_documents
from tests.test_plans import plan_of


def _counted(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_spans_are_contiguous_stream(spark):
    # whatever the canonical order, the start offsets must tile the
    # token stream exactly: sorted starts == exclusive cumsum of sizes
    rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
    packed = pack_documents(_counted(spark, rows), "n_tokens", "doc_id",
                            budget=64).collect()
    by_start = sorted(packed, key=lambda r: r.start_offset)
    expect = 0
    for r in by_start:
        assert r.start_offset == expect
        assert r.first_chunk == r.start_offset // 64
        assert r.last_chunk == (r.start_offset + max(r.n_tokens - 1, 0)) // 64
        expect += r.n_tokens


def test_partition_invariance(spark):
    rows = [(i, (i * 13) % 50 + 1) for i in range(300)]
    a = pack_documents(_counted(spark, rows).coalesce(1), "n_tokens",
                       "doc_id", budget=100)
    b = pack_documents(_counted(spark, rows).repartition(16), "n_tokens",
                       "doc_id", budget=100)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_chunk_fill_conserves_tokens(spark):
    rows = [(i, (i * 29) % 120 + 1) for i in range(150)]
    total = sum(n for _, n in rows)
    packed = pack_documents(_counted(spark, rows), "n_tokens", "doc_id",
                            budget=77)
    fills = chunk_fill(packed, budget=77).collect()
    assert sum(r.n_tokens for r in fills) == total
    # every chunk except the highest is exactly full
    last = max(r.chunk for r in fills)
    for r in fills:
        if r.chunk != last:
            assert r.n_tokens == 77, (r.chunk, r.n_tokens)


def test_zero_token_docs_place_without_span(spark):
    rows = [(1, 0), (2, 10), (3, 0)]
    packed = {r.key: r for r in
              pack_documents(_counted(spark, rows), "n_tokens", "doc_id",
                             budget=4).collect()}
    for r in packed.values():
        assert r.n_chunks == 1 or r.n_tokens > 0


def test_no_single_partition_sort_in_plan(spark):
    df = _counted(spark, [(i, 5) for i in range(100)])
    p = plan_of(pack_documents(df, "n_tokens", "doc_id", budget=64))
    # the only orderBy windows are per-bucket (partitionBy _b) or over
    # the 64 offset rows; a global Sort over the data would show as a
    # Sort with a SinglePartition exchange right above the scan
    assert "rangepartitioning(key" not in p.lower()


def test_pack_conservation_hypothesis(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(sizes=st.lists(st.integers(min_value=0, max_value=200),
                          min_size=1, max_size=60),
           budget=st.integers(min_value=1, max_value=97))
    def check(sizes, budget):
        rows = [(i, n) for i, n in enumerate(sizes)]
        packed = pack_documents(_counted(spark, rows), "n_tokens",
                                "doc_id", budget=budget)
        fills = chunk_fill(packed, budget=budget).collect()
        assert sum(r.n_tokens for r in fills) == sum(sizes)
        placed = packed.collect()
        assert len(placed) == len(sizes)
        starts = sorted(r.start_offset for r in placed)
        # starts tile [0, total): exclusive cumsum of the sizes in
        # canonical order
        total = 0
        seen = sorted((r.start_offset, r.n_tokens) for r in placed)
        for s, n in seen:
            assert s == total
            total += n

    check()
