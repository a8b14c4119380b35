"""Hand-computed fixtures for operators/graph_analytics.py — the
oracle-parity suite checks cross-engine equality; these check the MATH
on graphs small enough to verify by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from rel_db_to_graph_spark.operators.graph_analytics import (
    bfs_distances,
    cluster_representatives,
    clustering_coefficient,
    copurchase_edges,
    degrees,
    neighborhood_jaccard,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "u bigint, v bigint")


def test_triangle_counts_k4(spark):
    # K4: every vertex sits on C(3,2) = 3 triangles; 4 triangles total
    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(k4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_plus_pendant(spark):
    # triangle 1-2-3 with pendant 4 hanging off 3: pendant sits on none
    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(g).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_clustering_coefficient_values(spark):
    # node 3 (deg 3, on 1 triangle): 2*1/(3*2) = 0.333333
    # nodes 1, 2 (deg 2, on 1 triangle): 2*1/(2*1) = 1.0
    # node 4 (deg 1): excluded (deg < 2)
    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["node"]: (r["deg"], r["coeff"])
           for r in clustering_coefficient(g).collect()}
    assert got == {1: (2, 1.0), 2: (2, 1.0), 3: (3, 0.333333)}


def test_clustering_coefficient_zero_not_dropped(spark):
    # path 1-2-3: node 2 has deg 2 and no triangle -> coeff 0.0 row
    g = _edges(spark, [(1, 2), (2, 3)])
    got = {r["node"]: r["coeff"]
           for r in clustering_coefficient(g).collect()}
    assert got == {2: 0.0}


def test_neighborhood_jaccard_square(spark):
    # 4-cycle 1-2-3-4-1: opposite corners share BOTH neighbors.
    # common(1,3) = |{2,4}| = 2, deg both 2 -> jaccard = 2/(2+2-2) = 1.0
    g = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = {(r["a"], r["b"]): (r["common"], r["jaccard"])
           for r in neighborhood_jaccard(g, min_common=2).collect()}
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def test_bfs_distances_path(spark):
    # path 1-2-3-4-5-6, source 1, depth 4: node 6 unreachable in-budget
    g = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    got = {r["node"]: r["dist"]
           for r in bfs_distances(g, 1, max_depth=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_distances_cycle_takes_shortest(spark):
    # 5-cycle from 1: the two arcs meet; node 4 is 2 via 5-4, not 3 via 2-3
    g = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)])
    got = {r["node"]: r["dist"]
           for r in bfs_distances(g, 1, max_depth=4).collect()}
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}


def test_copurchase_max_basket_cap(spark):
    # order 10 has 3 parts (under cap), order 20 has 5 (dropped by cap=4)
    rows = [(10, p) for p in (1, 2, 3)] + [(20, p) for p in range(1, 6)]
    li = spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint")
    capped = copurchase_edges(li, min_count=1, max_basket=4)
    assert capped.count() == 3  # C(3,2) pairs from order 10 only
    full = copurchase_edges(li, min_count=1, max_basket=None)
    assert full.count() == 10  # 3 + C(5,2), pairs merged by count
    w = {(r["u"], r["v"]): r["w"] for r in full.collect()}
    assert w[(1, 2)] == 2  # co-occurs in both orders


def test_copurchase_dedups_within_order(spark):
    # the same (order, part) row twice must not double-count the pair
    li = spark.createDataFrame(
        [(10, 1), (10, 1), (10, 2)], "l_orderkey bigint, l_partkey bigint")
    got = copurchase_edges(li, min_count=1).collect()
    assert [(r["u"], r["v"], r["w"]) for r in got] == [(1, 2, 1)]


def test_cluster_representatives_longest_wins_ties_to_min_id(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id bigint, cluster_id bigint")
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5), (8, 5)],
        "doc_id bigint, n_chars int")
    got = {r["cluster_id"]: (r["rep_id"], r["rep_chars"])
           for r in cluster_representatives(clusters, docs).collect()}
    # cluster 1: docs 2 and 3 tie at 99 chars -> min id 2 wins
    # cluster 7: docs 7 and 8 tie at 5 chars -> min id 7 wins
    assert got == {1: (2, 99), 7: (7, 5)}


def test_degrees(spark):
    g = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["node"]: r["deg"] for r in degrees(g).collect()}
    assert got == {1: 2, 2: 2, 3: 3, 4: 1}


def test_triangle_plan_has_no_cartesian(spark):
    g = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    plan = triangle_counts(g)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _brute_k_core(pairs, k):
    """Pure-python peeling twin."""
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in [n for n, ns in adj.items() if len(ns) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(ns) for n, ns in adj.items()}


def test_k_core_toy(spark):
    from rel_db_to_graph_spark.operators.graph_analytics import k_core
    # K4 plus a tail 4-5-6: the 3-core is exactly the K4
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    got = {r["node"]: r["core_deg"]
           for r in k_core(_edges(spark, pairs), k=3).collect()}
    assert got == _brute_k_core(pairs, 3) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_matches_brute_force_on_copurchase(spark):
    from rel_db_to_graph_spark.operators.graph_analytics import (
        copurchase_edges, k_core)
    from rel_db_to_graph_spark.sources.catalog import load_table
    li = load_table(spark, SF_SMOKE, "lineitem")
    edges = copurchase_edges(li, min_count=2, max_basket=64)
    pairs = [(r["u"], r["v"]) for r in edges.collect()]
    got = {r["node"]: r["core_deg"] for r in k_core(edges, k=3).collect()}
    assert got == _brute_k_core(pairs, 3)
    assert got, "3-core empty at sf0.001 — fixture lost its signal"


def test_triangle_increment_equals_scratch_toy(spark):
    from rel_db_to_graph_spark.operators.graph_analytics import (
        triangle_counts, triangle_counts_incremental)
    # old: square 1-2-3-4 with diagonal 1-3; new: diagonal 2-4 + pendant
    old = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    new = _edges(spark, [(2, 4), (4, 5)])
    scratch = {r["node"]: r["n_triangles"]
               for r in triangle_counts(old.unionByName(new)).collect()}
    inc = {r["node"]: r["n_triangles"]
           for r in triangle_counts_incremental(old, new).collect()}
    assert inc == scratch
    # and the delta genuinely added: 2-4 closes two new triangles
    base = {r["node"]: r["n_triangles"]
            for r in triangle_counts(old).collect()}
    assert base != scratch


def test_triangle_increment_equals_scratch_copurchase(spark):
    from pyspark.sql import functions as F
    from rel_db_to_graph_spark.operators.graph_analytics import (
        copurchase_edges, triangle_counts, triangle_counts_incremental)
    from rel_db_to_graph_spark.sources.catalog import load_table
    li = load_table(spark, SF_SMOKE, "lineitem")
    old_e = copurchase_edges(li.filter(F.col("l_orderkey") % 10 != 0),
                             min_count=1, max_basket=64)
    all_e = copurchase_edges(li, min_count=1, max_basket=64)
    new_e = all_e.join(old_e.select("u", "v"), ["u", "v"], "left_anti")
    scratch = {r["node"]: r["n_triangles"]
               for r in triangle_counts(all_e).collect()}
    inc = {r["node"]: r["n_triangles"]
           for r in triangle_counts_incremental(old_e, new_e).collect()}
    assert inc == scratch


def test_small_lots_decorrelates(spark):
    from rel_db_to_graph_spark.queries import q_small_lots
    plan = (q_small_lots(spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_label_propagation_two_cliques(spark):
    from rel_db_to_graph_spark.operators.graph_analytics import (
        label_propagation,
    )
    # two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10:
    # least-label synchronous LPA pulls each clique to its min id
    g = _edges(spark, [(1, 2), (2, 3), (1, 3),
                       (10, 11), (11, 12), (10, 12), (3, 10)])
    got = {r["node"]: r["community"]
           for r in label_propagation(g, n_iter=5).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[11] == got[12]
    assert set(got) == {1, 2, 3, 10, 11, 12}


def test_label_propagation_partitioning_independent(spark):
    from rel_db_to_graph_spark.operators.graph_analytics import (
        copurchase_edges,
        label_propagation,
    )
    from rel_db_to_graph_spark.sources.catalog import load_table
    li = load_table(spark, SF_SMOKE, "lineitem")
    e = copurchase_edges(li, min_count=2, max_basket=64)
    a = {tuple(r) for r in label_propagation(e, n_iter=3).collect()}
    b = {tuple(r) for r in
         label_propagation(e.repartition(17), n_iter=3).collect()}
    assert a == b and a


def test_hyperball_estimates_track_exact_balls(spark):
    from rel_db_to_graph_spark.operators.graph_analytics import (
        ball_sizes_exact,
        hyperball,
    )
    # path 1-2-3-4-5 plus a triangle 5-6-7: known ball sizes
    g = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (5, 7),
                       (6, 7)])
    est = {r["node"]: (r["est_1"], r["est_2"])
           for r in hyperball(g, radius=2, lgk=14).collect()}
    exact = {r["node"]: (r["n_ball_1"], r["n_ball_2"])
             for r in ball_sizes_exact(g, radius=2).collect()}
    assert set(est) == set(exact)
    for n in exact:
        for e, x in zip(est[n], exact[n]):
            assert abs(e - x) <= max(1, 0.1 * x), (n, est[n], exact[n])
    # spot-pin the exact side: node 3's 1-ball = {2,3,4}, 2-ball adds 1,5
    assert exact[3] == (3, 5)
