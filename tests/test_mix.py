"""Stride-scheduled corpus mixing — proportionality, determinism, and
the TakeOrdered prefix plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.mix import (
    corpus_mix,
    mix_prefix,
    source_ordinals,
)
from tests.test_plans import plan_of


def _docs(spark, per_source=60, sources=("web", "wiki", "books")):
    rows = [(s_i * 1000 + i, s)
            for s_i, s in enumerate(sources) for i in range(per_source)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_ordinals_dense_per_source(spark):
    out = source_ordinals(_docs(spark), "source", "doc_id").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.ordinal)
    for s, ords in by_src.items():
        assert sorted(ords) == list(range(60))


def test_prefix_proportions_match_weights(spark):
    mixed = corpus_mix(_docs(spark), "source",
                       {"web": 3, "wiki": 2, "books": 1}, "doc_id")
    prefix = mix_prefix(mixed, 60).collect()
    counts = {}
    for r in prefix:
        counts[r.source] = counts.get(r.source, 0) + 1
    # 60 items at 3:2:1 -> 30/20/10, ±1 round of slack
    assert abs(counts["web"] - 30) <= 3
    assert abs(counts["wiki"] - 20) <= 2
    assert abs(counts["books"] - 10) <= 1


def test_partition_invariance(spark):
    d = _docs(spark)
    m1 = mix_prefix(corpus_mix(d.coalesce(1), "source", {"web": 2},
                               "doc_id"), 50).collect()
    m2 = mix_prefix(corpus_mix(d.repartition(16), "source", {"web": 2},
                               "doc_id"), 50).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]


def test_rejects_non_integer_weights(spark):
    with pytest.raises(ValueError):
        corpus_mix(_docs(spark), "source", {"web": 0}, "doc_id")


def test_prefix_plan_is_take_ordered(spark):
    mixed = corpus_mix(_docs(spark), "source", {"web": 2}, "doc_id")
    assert "TakeOrderedAndProject" in plan_of(mix_prefix(mixed, 10))
