"""Heterogeneous (to_hetero-style) forward over the real built graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.ml.hetero import hetero_gat_forward
from rel_db_to_graph_spark.operators.graph_build import build_graph
from tests.conftest import SF_SMOKE


def test_hetero_forward_all_types(spark):
    g = build_graph(spark, SF_SMOKE)
    emb = hetero_gat_forward(g, hidden=2, layers=1, seed=7)
    assert set(emb) == set(g["nodes"])
    for t, df in emb.items():
        n = g["nodes"][t].count()
        assert df.count() == n, t
        sample = df.limit(3).collect()
        assert all(len(r.emb) == 2 for r in sample)
        assert all(0.0 <= x <= 1.0 for r in sample for x in r.emb)


def test_hetero_forward_deterministic(spark):
    g = build_graph(spark, SF_SMOKE)
    a = hetero_gat_forward(g, hidden=2, layers=1, seed=7)["customer"]
    b = hetero_gat_forward(g, hidden=2, layers=1, seed=7)["customer"]
    ra = sorted((r.node_id, tuple(round(x, 10) for x in r.emb))
                for r in a.collect())
    rb = sorted((r.node_id, tuple(round(x, 10) for x in r.emb))
                for r in b.collect())
    assert ra == rb


def test_recommend_gnn_end_to_end(spark):
    """Full inference path: mutate -> hetero forward -> decode -> top-k.
    Deterministic, excludes the basket, probabilities in (0, 1)."""
    from rel_db_to_graph_spark.operators.recommend import recommend_parts_gnn
    from rel_db_to_graph_spark.sources.catalog import load_table

    rows = recommend_parts_gnn(spark, SF_SMOKE, k=5).collect()
    assert len(rows) == 5
    assert all(0.0 < r.prob < 1.0 for r in rows)

    li = load_table(spark, SF_SMOKE, "lineitem")
    min_ok = li.agg(F.min("l_orderkey")).first()[0]
    basket = {r.l_partkey for r in
              li.filter(F.col("l_orderkey") == min_ok)
              .select("l_partkey").distinct().collect()}
    assert basket.isdisjoint({r.p_partkey for r in rows})

    again = recommend_parts_gnn(spark, SF_SMOKE, k=5).collect()
    assert [(r.p_partkey, r.prob) for r in rows] == \
        [(r.p_partkey, r.prob) for r in again]


def test_hetero_messages_flow_across_types(spark):
    """Customers receive from orders (REVERSE_hasCust): their embeddings
    must differ from a graph with those edges removed."""
    g = build_graph(spark, SF_SMOKE)
    full = {r.node_id: r.emb for r in
            hetero_gat_forward(g, hidden=2, layers=1, seed=7)["customer"].collect()}

    pruned = {"nodes": g["nodes"],
              "edges": {k: v for k, v in g["edges"].items()
                        if k != ("customer", "REVERSE_hasCust", "orders")
                        and k != ("orders", "hasCust", "customer")}}
    cut = {r.node_id: r.emb for r in
           hetero_gat_forward(pruned, hidden=2, layers=1, seed=7)["customer"].collect()}
    # same seed, same shapes — different incident edge types => different values
    assert any(full[i] != cut[i] for i in full)
