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


#: resolution of the content-addressed dropout draw
_DROP_MOD = 1_000_000


def batch_norm(emb_df: DataFrame, dim: int, eps: float = 1e-5) -> DataFrame:
    """BatchNorm over an (node_id, emb array<double>) frame: per-dim
    (x - mean) / sqrt(var + eps), batch statistics computed JVM-side as
    one aggregation and broadcast back (the GATConfig norm='BatchNorm'
    option, model.py:10-24 / params.yaml). Affine params are the torch
    init (gamma=1, beta=0); like the attention weights they are seeded,
    not trained."""
    stats = emb_df.agg(
        *[F.avg(F.element_at("emb", i + 1)).alias(f"_m{i}")
          for i in range(dim)],
        *[F.var_pop(F.element_at("emb", i + 1)).alias(f"_v{i}")
          for i in range(dim)])
    return emb_df.crossJoin(F.broadcast(stats)).select(
        "node_id",
        F.array(*[(F.element_at("emb", i + 1) - F.col(f"_m{i}"))
                  / F.sqrt(F.col(f"_v{i}") + F.lit(eps))
                  for i in range(dim)]).alias("emb"))


def gat_layer(edges: DataFrame, feats: DataFrame, w_l: np.ndarray,
              w_r: np.ndarray, a: np.ndarray,
              activation: str = "sigmoid",
              dst_feats: DataFrame | None = None,
              dropout: float = 0.0, dropout_seed: int = 0,
              quantize: bool = False) -> DataFrame:
    """One GATv2 attention layer: (node_id, emb) -> (node_id, emb').

    Homogeneous by default; pass ``dst_feats`` for the bipartite /
    heterogeneous case (src endpoints projected from ``feats``, dst
    endpoints from ``dst_feats`` — the to_hetero per-edge-type shape).
    Nodes with no in-edges keep a zero embedding of the output width
    (they receive no messages — callers concat or sum self features,
    as gat_forward / hetero_forward do).

    ``dropout`` is PyG's attention-coefficient dropout (GATConfig
    dropout=0.15, params.yaml): each normalized α_ij is zeroed with
    probability p and the survivors scaled by 1/(1-p) (inverted
    dropout). The mask is CONTENT-ADDRESSED — xxhash64(src, dst,
    dropout_seed) — so it is a pure function of the edge, reproducible
    on any partitioning, and a fresh draw per (layer, edge type) via
    the seed.

    ``quantize=True`` makes the two order-dependent float reductions
    cross-engine exact (the repo's float-parity convention, the same
    per-term round(x, 6) + DECIMAL accumulate used by msg_agg /
    pagerank / lm_nll): each softmax numerator exp(e - max) is rounded
    to 6 dp before the decimal-exact partition-function sum, and each
    α·x product is rounded to 6 dp before the decimal-exact message
    sum. Everything else on the path is fixed-order per-row double
    arithmetic, which is already bit-identical across engines — this
    is what lets a DuckDB twin REPLAY the forward (oracle.py::
    _hetero_forward_q_sql) and upgrades it from rows-only to
    hash-checked.
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
    w_raw = F.exp(F.col("_e") - F.col("_mx"))
    weighted = (e_edges.join(mx, "dst")
                .withColumn("_w", F.round(w_raw, 6) if quantize else w_raw))
    z_sum = (F.sum(F.col("_w").cast("decimal(27,6)")).cast("double")
             if quantize else F.sum("_w"))
    z = weighted.groupBy("dst").agg(z_sum.alias("_z"))
    alphas = (weighted.join(z, "dst")
              .withColumn("_alpha", F.col("_w") / F.col("_z")))

    if dropout > 0.0:
        keep = (F.pmod(F.xxhash64("src", "dst", F.lit(int(dropout_seed))),
                       F.lit(_DROP_MOD))
                >= F.lit(int(dropout * _DROP_MOD)))
        alphas = alphas.withColumn(
            "_alpha",
            F.when(keep, F.col("_alpha") / F.lit(1.0 - dropout))
            .otherwise(F.lit(0.0)))

    # α-weighted message aggregation, per (node, dim) — partial-agg
    ax = F.col("_alpha") * F.col("x")
    msg_sum = (F.sum(F.round(ax, 6).cast("decimal(27,6)")).cast("double")
               if quantize else F.sum(ax))
    per_dim = (
        alphas.select("dst", "_alpha", F.posexplode("_s").alias("pos", "x"))
        .groupBy("dst", "pos")
        .agg(msg_sum.alias("v"))
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
                layers: int = 2, seed: int = 42,
                dropout: float = 0.0, norm: str | None = None) -> DataFrame:
    """Multi-layer GATv2 forward with deterministic seeded parameters.
    Self features are concatenated into each layer's input so nodes
    without in-edges still carry signal. ``dropout``/``norm`` are the
    GATConfig knobs (model.py:10-24): attention dropout per layer
    (fresh content-addressed mask each layer) and norm='batch' for
    BatchNorm between layers."""
    rng = np.random.default_rng(seed)
    emb = features
    in_dim = len(emb.select("emb").first()["emb"])
    for layer in range(layers):
        w_l = rng.normal(0, 0.5, size=(hidden, in_dim))
        w_r = rng.normal(0, 0.5, size=(hidden, in_dim))
        a = rng.normal(0, 0.5, size=hidden)
        emb = gat_layer(edges, emb, w_l, w_r, a,
                        dropout=dropout, dropout_seed=seed + layer)
        if norm == "batch":
            emb = batch_norm(emb, hidden)
        emb = emb.localCheckpoint(eager=False)
        in_dim = hidden
    return emb
