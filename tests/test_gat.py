"""GATv2 attention layer: numpy cross-check on a toy graph, softmax
properties, determinism."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from rel_db_to_graph_spark.ml.gat import gat_forward, gat_layer


def _toy(spark):
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 0)], "src long, dst long")
    feats = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "node_id long, emb array<double>")
    return edges, feats


def _numpy_gat(edges, h, w_l, w_r, a, mask=None, p=0.0):
    s = {i: w_l @ np.array(v) for i, v in h.items()}
    t = {i: w_r @ np.array(v) for i, v in h.items()}

    def leaky(x):
        return np.where(x > 0, x, 0.2 * x)

    e = {(i, j): float(a @ leaky(s[i] + t[j])) for i, j in edges}
    out = {}
    for j in h:
        inc = [(i, jj) for i, jj in edges if jj == j]
        if not inc:
            out[j] = np.zeros(w_l.shape[0])
            continue
        mx = max(e[ij] for ij in inc)
        ws = {ij: math.exp(e[ij] - mx) for ij in inc}
        z = sum(ws.values())
        alpha = {ij: ws[ij] / z for ij in inc}
        if mask is not None:
            alpha = {ij: (alpha[ij] / (1.0 - p) if mask[ij] else 0.0)
                     for ij in inc}
        msg = sum(alpha[(i, jj)] * s[i] for i, jj in inc)
        out[j] = 1.0 / (1.0 + np.exp(-msg))
    return out


def test_gat_matches_numpy(spark):
    edges_df, feats_df = _toy(spark)
    rng = np.random.default_rng(3)
    w_l = rng.normal(0, 0.5, (3, 2))
    w_r = rng.normal(0, 0.5, (3, 2))
    a = rng.normal(0, 0.5, 3)

    got = {r.node_id: r.emb for r in
           gat_layer(edges_df, feats_df, w_l, w_r, a).collect()}
    want = _numpy_gat([(0, 2), (1, 2), (2, 0)],
                      {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [1.0, 1.0]},
                      w_l, w_r, a)
    for j in want:
        assert np.allclose(got[j], want[j], rtol=1e-10), (j, got[j], want[j])


def test_gat_dropout_and_batchnorm_match_numpy(spark):
    """GATConfig knobs on: attention dropout (content-addressed mask)
    and BatchNorm, both cross-checked against the numpy twin."""
    from rel_db_to_graph_spark.ml.gat import _DROP_MOD, batch_norm

    edges_df, feats_df = _toy(spark)
    rng = np.random.default_rng(3)
    w_l = rng.normal(0, 0.5, (3, 2))
    w_r = rng.normal(0, 0.5, (3, 2))
    a = rng.normal(0, 0.5, 3)
    p = 0.4

    def mask_for(ds):
        # the mask the layer will draw (pure function of the edge + seed)
        return {(r.src, r.dst): bool(r.keep) for r in edges_df.select(
            "src", "dst",
            (F.pmod(F.xxhash64("src", "dst", F.lit(ds)), F.lit(_DROP_MOD))
             >= F.lit(int(p * _DROP_MOD))).alias("keep")).collect()}

    # pick a seed whose draw both keeps and drops (deterministic search)
    for dseed in range(50):
        mask = mask_for(dseed)
        if any(mask.values()) and not all(mask.values()):
            break
    else:
        raise AssertionError("no mixed mask in 50 seeds")

    layer = gat_layer(edges_df, feats_df, w_l, w_r, a,
                      dropout=p, dropout_seed=dseed)
    got = {r.node_id: r.emb for r in layer.collect()}
    want = _numpy_gat([(0, 2), (1, 2), (2, 0)],
                      {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [1.0, 1.0]},
                      w_l, w_r, a, mask=mask, p=p)
    for j in want:
        assert np.allclose(got[j], want[j], rtol=1e-10), (j, got[j], want[j])
    # deterministic: the mask is content-addressed, not a random draw
    again = {r.node_id: r.emb for r in
             gat_layer(edges_df, feats_df, w_l, w_r, a,
                       dropout=p, dropout_seed=dseed).collect()}
    assert got == again

    # BatchNorm over the layer output vs numpy mean/var_pop
    normed = {r.node_id: r.emb for r in batch_norm(layer, 3).collect()}
    mat = np.array([want[j] for j in sorted(want)])
    mu, var = mat.mean(axis=0), mat.var(axis=0)
    for j in want:
        expect = (want[j] - mu) / np.sqrt(var + 1e-5)
        assert np.allclose(normed[j], expect, rtol=1e-8), (j, normed[j], expect)


def test_gat_forward_knobs_run(spark):
    """Forward passes with dropout+BatchNorm stay finite, deterministic,
    and differ from the knob-free forward."""
    edges_df, feats_df = _toy(spark)
    on = gat_forward(edges_df, feats_df, hidden=3, layers=2, seed=5,
                     dropout=0.15, norm="batch").collect()
    again = gat_forward(edges_df, feats_df, hidden=3, layers=2, seed=5,
                        dropout=0.15, norm="batch").collect()
    off = gat_forward(edges_df, feats_df, hidden=3, layers=2, seed=5).collect()
    a_on = np.array([e for _, e in sorted((r.node_id, r.emb) for r in on)])
    a_again = np.array([e for _, e in sorted((r.node_id, r.emb) for r in again)])
    a_off = np.array([e for _, e in sorted((r.node_id, r.emb) for r in off)])
    # batch stats sum doubles across partitions -> last-ulp drift allowed
    assert np.allclose(a_on, a_again, rtol=1e-12)
    assert not np.allclose(a_on, a_off, rtol=1e-3)
    assert np.isfinite(a_on).all()


def test_gat_forward_shape_and_determinism(spark):
    edges_df, feats_df = _toy(spark)
    a = gat_forward(edges_df, feats_df, hidden=3, layers=2, seed=5).collect()
    b = gat_forward(edges_df, feats_df, hidden=3, layers=2, seed=5).collect()
    assert sorted((r.node_id, r.emb) for r in a) == \
           sorted((r.node_id, r.emb) for r in b)
    assert all(len(r.emb) == 3 for r in a)
    # node 1 has no in-edges anywhere -> zero embedding after layer 1,
    # sigmoid outputs elsewhere stay in (0, 1)
    em = {r.node_id: r.emb for r in a}
    assert all(0.0 <= x <= 1.0 for v in em.values() for x in v)


def test_gat_on_real_graph(spark):
    from rel_db_to_graph_spark.operators.graph_build import build_graph
    from tests.conftest import SF_SMOKE

    g = build_graph(spark, SF_SMOKE)
    # homogeneous customer graph: self loops only (sanity: runs + shapes)
    cust = g["nodes"]["customer"]
    feats = cust.select(
        "node_id", F.array((F.col("c_acctbal") / 10000.0),
                           (F.col("degree") / 10.0)).alias("emb"))
    loops = g["edges"][("customer", "SELF_LOOP", "customer")]
    out = gat_forward(loops, feats, hidden=2, layers=1, seed=1)
    assert out.count() == cust.count()
    assert all(len(r.emb) == 2 for r in out.limit(5).collect())
