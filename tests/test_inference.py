"""G1 inference: the pure-python catalog (used by the graph builder) must
match the DataFrame catalog (the oracle-checked query), and both must match
FIXTURES.md §2's expected classification."""

from __future__ import annotations

from rel_db_to_graph_spark.plans.inference import (
    edge_catalog,
    edge_catalog_py,
    node_tables,
    node_tables_py,
)


def test_python_catalog_matches_dataframe(spark):
    df_rows = sorted(tuple(r) for r in edge_catalog(spark).collect())
    py_rows = sorted(
        (d["src_table"], d["relation"], d["dst_table"],
         d["pair_table"], d["src_col"], d["dst_col"])
        for d in edge_catalog_py())
    assert df_rows == py_rows


def test_python_nodes_match_dataframe(spark):
    assert sorted(tuple(r) for r in node_tables(spark).collect()) == \
           sorted(node_tables_py())


def test_expected_classification():
    edges = {(d["src_table"], d["relation"], d["dst_table"])
             for d in edge_catalog_py()}
    assert edges == {
        ("nation", "hasRegion", "region"),
        ("customer", "hasNation", "nation"),
        ("supplier", "hasNation", "nation"),
        ("orders", "hasCust", "customer"),
        ("orders", "hasPart", "part"),       # lineitem junction
    }
    assert dict(node_tables_py()).keys() == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "events", "documents", "embeddings"}


def test_chinook_shape_junction(spark):
    """FIXTURES.md §4: playlist_track-style 2-PK junction pairs by seq."""
    from rel_db_to_graph_spark.operators.graph_build import dense_ids, edges_dense
    playlists = spark.createDataFrame([(1,), (2,)], "PlaylistId long")
    tracks = spark.createDataFrame([(10,), (11,), (12,)], "TrackId long")
    pt = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (2, 10)], "PlaylistId long, TrackId long")
    edges = edges_dense(
        pt.selectExpr("PlaylistId as src_pk", "TrackId as dst_pk"),
        dense_ids(playlists, "PlaylistId"),
        dense_ids(tracks, "TrackId"))
    got = sorted((r.src, r.dst) for r in edges.collect())
    # playlist 1 -> dense 0, 2 -> 1; track 10 -> 0, 11 -> 1, 12 -> 2
    assert got == [(0, 0), (0, 1), (1, 0), (1, 2)]
