"""The SQL surface: registered views must answer spark.sql queries with
the same results as the DataFrame path."""

from __future__ import annotations

from rel_db_to_graph_spark.operators.graph_build import build_graph
from rel_db_to_graph_spark.sql import register_graph_views, register_views
from tests.conftest import SF_SMOKE


def test_star_schema_views(spark):
    names = register_views(spark, SF_SMOKE)
    assert "lineitem" in names
    got = spark.sql("""
        SELECT l_returnflag, count(*) AS n FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """).collect()
    assert [r.l_returnflag for r in got] == ["A", "N", "R"]
    assert sum(r.n for r in got) == spark.table("lineitem").count()


def test_graph_views_queryable(spark):
    g = build_graph(spark, SF_SMOKE)
    names = register_graph_views(spark, g)
    assert "g_nodes_customer" in names
    assert "g_edges_orders__hasCust__customer" in names
    row = spark.sql("""
        SELECT count(*) AS n_edges,
               count(DISTINCT dst) AS n_customers
        FROM g_edges_orders__hasCust__customer
    """).collect()[0]
    assert row.n_edges == g["edges"][("orders", "hasCust", "customer")].count()
    assert row.n_customers <= g["nodes"]["customer"].count()
    # join graph view back to a node view
    top = spark.sql("""
        SELECT n.pk, count(*) AS deg
        FROM g_edges_orders__hasCust__customer e
        JOIN g_nodes_customer n ON e.dst = n.node_id
        GROUP BY n.pk ORDER BY deg DESC, n.pk LIMIT 3
    """).collect()
    assert len(top) == 3 and top[0].deg >= top[-1].deg
