"""GATv2-style attention message passing as DataFrame ops (L5 parity —
the reference wraps GATv2Conv via to_hetero, model.py:92-94, train.py:46).

Per layer, single head, following Brody et al. 2021 ("How Attentive Are
Graph Attention Networks?", public arXiv):

    s_i  = W_l · h_i          (source projection)
    t_j  = W_r · h_j          (target projection)
    e_ij = a · LeakyReLU(s_i + t_j)        — the v2 ordering: the shared
           nonlinearity is applied BEFORE the attention vector, which is
           what makes attention conditional on the query node
    α_ij = softmax over incoming edges of j (numerically stabilized:
           exp(e - max_j e) / Σ)
    h'_j = σ( Σ_i α_ij · s_i )

Spark decomposition — every step shuffles at most once and only on edge
endpoints:
    * projections: per-row linear maps (codegen or Arrow GEMM);
    * e_ij: per-edge expression after two endpoint joins;
    * softmax: groupBy(dst).max then groupBy(dst).sum — two partial-
      aggregated shuffles over (dst, scalar), NOT over feature vectors;
    * weighted aggregation: the same posexplode/groupBy(node, dim)
      pattern as plain aggregate-messages, now weighted by α.

Self-loops are expected to come from the graph itself (G7) — the
reference sets add_self_loops=False (train.py:45) because the graph
already carries them; same here.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.functions.vector import dot, sigmoid
from rel_db_to_graph_spark.ml.gnn import linear_layer


def _leaky_relu(x, alpha: float = 0.2):
    return F.when(x > 0, x).otherwise(x * F.lit(alpha))


def gat_layer(edges: DataFrame, feats: DataFrame, w_l: np.ndarray,
              w_r: np.ndarray, a: np.ndarray,
              activation: str = "sigmoid",
              dst_feats: DataFrame | None = None) -> DataFrame:
    """One GATv2 attention layer: (node_id, emb) -> (node_id, emb').

    Homogeneous by default; pass ``dst_feats`` for the bipartite /
    heterogeneous case (src endpoints projected from ``feats``, dst
    endpoints from ``dst_feats`` — the to_hetero per-edge-type shape).
    Nodes with no in-edges keep a zero embedding of the output width
    (they receive no messages — callers concat or sum self features,
    as gat_forward / hetero_forward do).
    """
    out_dim = w_l.shape[0]
    dstf = feats if dst_feats is None else dst_feats

    src_proj = feats.select(
        F.col("node_id").alias("src"),
        linear_layer(F.col("emb"), w_l, activation=None).alias("_s"),
    ).localCheckpoint(eager=False)
    dst_proj = dstf.select(
        F.col("node_id").alias("dst"),
        linear_layer(F.col("emb"), w_r, activation=None).alias("_t"),
    ).localCheckpoint(eager=False)

    a_lit = F.array(*[F.lit(float(v)) for v in a])
    e_edges = (
        edges
        .join(src_proj, "src")
        .join(dst_proj, "dst")
        .withColumn("_e", dot(F.transform(F.zip_with("_s", "_t",
                                                     lambda s, t: s + t),
                                          lambda x: _leaky_relu(x)),
                              a_lit))
    )

    # numerically-stable per-dst softmax: two scalar aggregations
    mx = e_edges.groupBy("dst").agg(F.max("_e").alias("_mx"))
    weighted = (e_edges.join(mx, "dst")
                .withColumn("_w", F.exp(F.col("_e") - F.col("_mx"))))
    z = weighted.groupBy("dst").agg(F.sum("_w").alias("_z"))
    alphas = (weighted.join(z, "dst")
              .withColumn("_alpha", F.col("_w") / F.col("_z")))

    # α-weighted message aggregation, per (node, dim) — partial-agg
    per_dim = (
        alphas.select("dst", "_alpha", F.posexplode("_s").alias("pos", "x"))
        .groupBy("dst", "pos")
        .agg(F.sum(F.col("_alpha") * F.col("x")).alias("v"))
    )
    agg = (
        per_dim.groupBy("dst")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos", "v"))),
                         lambda s: s["v"]).alias("_msg"))
    )
    act = (lambda c: sigmoid(c)) if activation == "sigmoid" else (lambda c: c)
    return (
        dstf.select("node_id")
        .join(agg.withColumnRenamed("dst", "node_id"), "node_id", "left")
        .select(
            "node_id",
            F.coalesce(
                F.transform("_msg", lambda x: act(x)),
                F.array_repeat(F.lit(0.0), out_dim),
            ).alias("emb"))
    )


def gat_forward(edges: DataFrame, features: DataFrame, hidden: int = 4,
                layers: int = 2, seed: int = 42) -> DataFrame:
    """Multi-layer GATv2 forward with deterministic seeded parameters.
    Self features are concatenated into each layer's input so nodes
    without in-edges still carry signal."""
    rng = np.random.default_rng(seed)
    emb = features
    in_dim = len(emb.select("emb").first()["emb"])
    for _ in range(layers):
        w_l = rng.normal(0, 0.5, size=(hidden, in_dim))
        w_r = rng.normal(0, 0.5, size=(hidden, in_dim))
        a = rng.normal(0, 0.5, size=hidden)
        emb = gat_layer(edges, emb, w_l, w_r, a)
        emb = emb.localCheckpoint(eager=False)
        in_dim = hidden
    return emb
