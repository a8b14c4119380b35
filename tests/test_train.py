"""Training-loop tests: loss decreases, learns a separable rule, best-epoch
checkpointing, graph sink/source roundtrip, encoders, config reflection."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from rel_db_to_graph_spark.config import SplitConfig, TrainConfig, config_from_signature
from rel_db_to_graph_spark.functions.encoders import (
    encode_features,
    identity_encoder,
    one_hot_encoder,
)
from rel_db_to_graph_spark.ml.train import train_edge_scorer
from rel_db_to_graph_spark.operators.graph_build import build_graph, load_graph
from tests.conftest import SF_SMOKE


def test_training_learns_separable_rule(spark):
    # label = 1 iff x0 + x1 > 1 — linearly separable
    rows = [((float(i % 7) / 7, float(i % 5) / 5),) for i in range(400)]
    df = spark.createDataFrame(
        [(i, r[0][0], r[0][1]) for i, r in enumerate(rows)], "id long, a double, b double"
    ).select(
        F.col("id").alias("src"), F.col("id").alias("dst"),
        F.array("a", "b").alias("features"),
        (F.col("a") + F.col("b") > 1.0).cast("int").alias("label"))
    res = train_edge_scorer(df, dim=2, epochs=25, lr=2.0)
    assert res.history[0]["train_loss"] > res.history[-1]["train_loss"]
    assert res.best_val_acc > 0.9
    assert res.best_epoch >= 0
    assert all(math.isfinite(x) for x in res.weights)


def test_minibatch_training(spark):
    df = spark.createDataFrame(
        [(i, i, [float(i % 7) / 7, float(i % 5) / 5],
          int((i % 7) / 7 + (i % 5) / 5 > 1.0)) for i in range(300)],
        "src long, dst long, features array<double>, label int")
    res = train_edge_scorer(df, dim=2, epochs=4, lr=1.0, n_batches=3)
    again = train_edge_scorer(df, dim=2, epochs=4, lr=1.0, n_batches=3)
    assert res.weights == again.weights            # content-addressed batches
    assert res.best_val_acc > 0.5
    full = train_edge_scorer(df, dim=2, epochs=4, lr=1.0, n_batches=1)
    assert res.weights != full.weights             # actually different paths


def test_training_deterministic(spark):
    df = spark.createDataFrame(
        [(i, i, [float(i % 3), 1.0], i % 2) for i in range(100)],
        "src long, dst long, features array<double>, label int")
    r1 = train_edge_scorer(df, dim=2, epochs=5, lr=0.5)
    r2 = train_edge_scorer(df, dim=2, epochs=5, lr=0.5)
    assert r1.weights == r2.weights and r1.bias == r2.bias


def test_adamw_matches_numpy_twin(spark):
    """Full-batch logistic + AdamW in Spark == the same loop in numpy
    (torch AdamW semantics: decoupled decay, bias-corrected moments)."""
    import numpy as np

    rows = [(i, i, [float(i % 3), 1.0], i % 2) for i in range(60)]
    df = spark.createDataFrame(
        rows, "src long, dst long, features array<double>, label int")
    res = train_edge_scorer(df, dim=2, epochs=3, lr=0.1, val_frac=0.0,
                            optimizer="adamw", weight_decay=0.01)

    X = np.array([r[2] for r in rows])
    y = np.array([r[3] for r in rows], dtype=float)
    w, b = np.zeros(2), 0.0
    m = np.zeros(3); v = np.zeros(3)
    for t in range(1, 4):
        z = np.clip(X @ w + b, -30, 30)
        p = 1 / (1 + np.exp(-z))
        err = p - y
        g = np.concatenate([(err @ X) / len(y), [err.mean()]])
        params = np.concatenate([w, [b]])
        params = params - 0.1 * 0.01 * params
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        params = params - 0.1 * (m / (1 - 0.9 ** t)) / (
            np.sqrt(v / (1 - 0.999 ** t)) + 1e-8)
        w, b = params[:2], params[2]
    assert res.weights == pytest.approx(list(w), rel=1e-9)
    assert res.bias == pytest.approx(b, rel=1e-9)


def test_link_projection_joint_training(spark):
    """The projection+decoder trainer drives BCE down on a task the raw
    dot-product decoder gets wrong: labels follow -e_src·e_dst, so W must
    LEARN a rotation. Deterministic across runs."""
    import numpy as np

    rng = np.random.default_rng(0)
    es = rng.normal(size=(300, 2)); ed = rng.normal(size=(300, 2))
    lab = ((es * ed).sum(axis=1) < 0).astype(int)   # anti-correlated rule
    df = spark.createDataFrame(
        [(i, i, [float(a) for a in es[i]], [float(d) for d in ed[i]],
          int(lab[i])) for i in range(300)],
        "src long, dst long, e_src array<double>, e_dst array<double>, label int")
    from rel_db_to_graph_spark.ml.train import train_link_projection
    res = train_link_projection(df, hidden=2, epochs=25, lr=0.3)
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
    assert res.history[-1]["train_acc"] > 0.8
    again = train_link_projection(df, hidden=2, epochs=25, lr=0.3)
    assert res.weights == again.weights and res.bias == again.bias


def test_graph_roundtrip(spark):
    with tempfile.TemporaryDirectory() as d:
        g = build_graph(spark, SF_SMOKE, out_dir=d)
        loaded = load_graph(spark, d)
        assert set(loaded["nodes"]) == set(g["nodes"])
        assert set(loaded["edges"]) == set(g["edges"])
        for t in g["nodes"]:
            assert loaded["nodes"][t].count() == g["nodes"][t].count()
        key = ("orders", "hasPart", "part")
        assert loaded["edges"][key].exceptAll(g["edges"][key]).count() == 0


def test_encoders(spark):
    df = spark.createDataFrame([(1, 2.0, "x"), (2, 4.0, "y")],
                               "id long, v double, c string")
    out = encode_features(df, {
        "v": identity_encoder,
        "c": one_hot_encoder(["x", "y", "z"]),
    })
    rows = {r.id: r.features for r in out.collect()}
    assert rows[1] == [2.0, 1.0, 0.0, 0.0]
    assert rows[2] == [4.0, 0.0, 1.0, 0.0]


def test_config_reflection():
    def fake_split(num_val: float = 0.1, num_test: float = 0.2,
                   is_undirected: bool = False): ...
    Cfg = config_from_signature(fake_split, "SplitCfg")
    c = Cfg()
    assert c.num_val == 0.1 and c.num_test == 0.2 and c.is_undirected is False
    assert TrainConfig().gnn.depth_sizes == [15, 15]
    assert SplitConfig().num_val == 0.15


def test_graph_roundtrip_with_edge_attrs(spark):
    """edge_attrs (C:48-53) thread through build_graph, survive the
    parquet sink, and do NOT leak onto reverse/self-loop edges (C:247)."""
    key = ("orders", "hasPart", "part")
    with tempfile.TemporaryDirectory() as d:
        g = build_graph(spark, SF_SMOKE, out_dir=d,
                        edge_attrs={key: ["l_quantity", "l_extendedprice"]})
        loaded = load_graph(spark, d)
        cols = loaded["edges"][key].columns
        assert cols == ["src", "dst", "l_quantity", "l_extendedprice"]
        assert dict(loaded["edges"][key].dtypes)["l_quantity"] == "double"
        rev = loaded["edges"][("part", "REVERSE_hasPart", "orders")]
        assert rev.columns == ["src", "dst"]
        loops = loaded["edges"][("orders", "SELF_LOOP", "orders")]
        assert loops.columns == ["src", "dst"]
        # row-aligned: per-(src,dst) attr multiset matches the raw junction
        got = (loaded["edges"][key].groupBy().sum("l_quantity").collect()[0][0])
        from rel_db_to_graph_spark.sources.catalog import load_table as lt
        want = (lt(spark, SF_SMOKE, "lineitem")
                .filter("l_orderkey is not null and l_partkey is not null")
                .groupBy().sum("l_quantity").collect()[0][0])
        assert abs(got - want) < 1e-6
