"""L7-L11 — the training loop, Spark-native.

The reference trains with torch autograd + AdamW in a Lightning loop
(model.py:151-152, train.py:72-80). The Spark-idiomatic decomposition of
that loop: the *data-parallel* part of each step — forward, loss, and the
gradient REDUCTION over the batch — is a DataFrame aggregation; the
*parameter update* is driver-side arithmetic on a small vector (the
reference's hidden size is 10; a GNN layer's weights are KBs). One epoch
= one aggregation job; parameters travel to executors as literals (a
broadcast of KBs), gradients come back as one collected row per
dimension. This is exactly the "sampling and reduction are the big-data
parts" observation from SURVEY.md §3.2.

Model: logistic edge scorer p = sigmoid(w·phi + b) over per-edge feature
vectors (the L6 decoder with learnable weights). Loss: BCE (L7,
model.py:118). Metrics per epoch (L8). Best-epoch weight checkpointing
on val accuracy (L11, train.py:63-68). Full-batch gradient descent:
deterministic, no per-row randomness — reproducibility is a property,
not a seed-hope (the reference pins seeds everywhere, setup.py:7-21).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.functions.vector import dot, sigmoid
from rel_db_to_graph_spark.operators.split import hash_split


@dataclass
class TrainResult:
    weights: list[float]
    bias: float
    history: list[dict] = field(default_factory=list)
    best_epoch: int = -1
    best_val_acc: float = 0.0


def _epoch_stats(df: DataFrame, w: list[float], b: float) -> dict:
    """One pass: per-dimension gradient sums + loss + confusion counts."""
    wlit = F.array(*[F.lit(float(x)) for x in w])
    z = dot(F.col("features"), wlit) + F.lit(float(b))
    p = sigmoid(F.greatest(F.least(z, F.lit(30.0)), F.lit(-30.0)))
    y = F.col("label").cast("double")
    err = (p - y).alias("err")
    loss = -(y * F.log(p) + (1 - y) * F.log(1 - p))

    scored = df.select(
        F.col("features"), y.alias("y"), err, loss.alias("loss"),
        (p > 0.5).cast("int").alias("yhat"))
    agg = (
        scored.select(
            "y", "err", "loss", "yhat",
            F.posexplode("features").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum(F.col("err") * F.col("x")).alias("gw"),
             F.sum("err").alias("gb"),
             F.sum("loss").alias("loss_sum"),
             F.count("*").alias("n"),
             F.sum((F.col("yhat") == F.col("y").cast("int")).cast("long"))
             .alias("correct"))
        .collect()
    )
    if not agg:
        # empty frame (empty val split / empty content-addressed batch):
        # zero gradients, no metric signal — callers skip the step
        return {"gw": [0.0] * len(w), "gb": 0.0, "loss": 0.0,
                "acc": 0.0, "n": 0}
    by_pos = {r.pos: r for r in agg}
    n = by_pos[0].n
    return {
        "gw": [by_pos[i].gw / n for i in range(len(w))],
        "gb": by_pos[0].gb / n,
        "loss": by_pos[0].loss_sum / n,
        "acc": by_pos[0].correct / n,
        "n": n,
    }


def train_edge_scorer(examples: DataFrame, dim: int, epochs: int = 20,
                      lr: float = 0.5, val_frac: float = 0.2,
                      seed: int = 42, n_batches: int = 1) -> TrainResult:
    """Logistic training over (features array<double>, label int, src,
    dst) edge examples. Returns learned weights + the per-epoch metric
    history, with best-val-accuracy checkpointing.

    ``n_batches`` > 1 = mini-batch SGD (L4, the reference's batch_size
    512 + shuffle=True, dataloader.py:24-36): batch membership is
    content-addressed — hash(src, dst, epoch) mod n_batches — so the
    per-epoch "shuffle" is deterministic yet differs across epochs, and
    each batch is a FILTER over the cached frame (no repartition per
    batch). One gradient job per batch per epoch.
    """
    split = hash_split(examples, val_frac=val_frac, test_frac=0.0, seed=seed)
    train = split.filter(F.col("split") == "train").drop("split").cache()
    val = split.filter(F.col("split") == "val").drop("split").cache()
    train.count(), val.count()

    w, b = [0.0] * dim, 0.0
    result = TrainResult(weights=w, bias=b)
    best = (w, b)
    for epoch in range(epochs):
        if n_batches > 1:
            for bi in range(n_batches):
                batch = train.filter(
                    F.pmod(F.xxhash64("src", "dst", F.lit(seed + epoch)),
                           F.lit(n_batches)) == bi)
                bstats = _epoch_stats(batch, w, b)
                w = [wi - lr * gi for wi, gi in zip(w, bstats["gw"])]
                b = b - lr * bstats["gb"]
            stats = _epoch_stats(train, w, b)
        else:
            stats = _epoch_stats(train, w, b)
            w = [wi - lr * gi for wi, gi in zip(w, stats["gw"])]
            b = b - lr * stats["gb"]
        vstats = _epoch_stats(val, w, b)
        result.history.append({
            "epoch": epoch, "train_loss": stats["loss"],
            "train_acc": stats["acc"], "val_loss": vstats["loss"],
            "val_acc": vstats["acc"],
        })
        # L11: keep the best-val-accuracy parameters (monitor=val_accuracy,
        # mode=max, save_top_k=1 — train.py:63-68)
        if vstats["acc"] >= result.best_val_acc:
            result.best_val_acc = vstats["acc"]
            result.best_epoch = epoch
            best = (list(w), b)

    result.weights, result.bias = best
    train.unpersist(), val.unpersist()
    return result


def edge_examples(edges_labeled: DataFrame, node_features: DataFrame,
                  feat_cols: list[str]) -> DataFrame:
    """Join (src, dst, label) edges to per-node features and build the
    per-edge feature vector [src_feats..., dst_feats..., src·dst]."""
    sf = node_features.select(
        F.col("node_id").alias("src"),
        *[F.col(c).alias(f"_s_{c}") for c in feat_cols])
    df_ = node_features.select(
        F.col("node_id").alias("dst"),
        *[F.col(c).alias(f"_d_{c}") for c in feat_cols])
    joined = edges_labeled.join(sf, "src").join(df_, "dst")
    s_arr = F.array(*[F.col(f"_s_{c}").cast("double") for c in feat_cols])
    d_arr = F.array(*[F.col(f"_d_{c}").cast("double") for c in feat_cols])
    return joined.select(
        "src", "dst", "label",
        F.concat(s_arr, d_arr, F.array(dot(s_arr, d_arr))).alias("features"))
