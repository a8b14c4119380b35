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


def _skewed(spark):
    # 100 web docs, 25 wiki, 4 books — a skewed corpus for tempering
    rows = ([(i, "web") for i in range(100)]
            + [(1000 + i, "wiki") for i in range(25)]
            + [(2000 + i, "books") for i in range(4)])
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_weights_upsample_small_sources():
    from rel_db_to_graph_spark.operators.mix import temperature_weights
    w = temperature_weights({"web": 100, "wiki": 25, "books": 4}, tau=0.5)
    # sqrt tempering: 100 -> 100, 25/100 -> 50, 4/100 -> 20
    assert w == {"web": 100, "wiki": 50, "books": 20}
    flat = temperature_weights({"web": 100, "wiki": 25}, tau=0.0)
    assert flat == {"web": 100, "wiki": 100}      # tau=0: uniform


def test_temperature_mix_prefix_shares(spark):
    from rel_db_to_graph_spark.operators.mix import corpus_mix_temperature
    mixed = corpus_mix_temperature(_skewed(spark), "source", "doc_id",
                                   tau=0.5)
    prefix = (mixed.orderBy("vtime", "source", "ordinal").limit(34)
              .collect())
    counts = {}
    for r in prefix:
        counts[r.source] = counts.get(r.source, 0) + 1
    # weights 100:50:20 -> shares 20/10/4 in a 34-prefix (±1 slack),
    # vs raw data shares 100:25:4 — small sources are upsampled
    assert abs(counts["web"] - 20) <= 2
    assert abs(counts["wiki"] - 10) <= 2
    assert abs(counts["books"] - 4) <= 1


def test_temperature_mix_deterministic_and_exhausts(spark):
    from rel_db_to_graph_spark.operators.mix import corpus_mix_temperature
    d = _skewed(spark)
    a = sorted(map(tuple, corpus_mix_temperature(
        d.coalesce(1), "source", "doc_id").collect()))
    b = sorted(map(tuple, corpus_mix_temperature(
        d.repartition(16), "source", "doc_id").collect()))
    assert a == b and len(a) == 129
