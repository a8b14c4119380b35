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


class AdamW:
    """L9 — the reference's optimizer (model.py:151-152, torch.optim.AdamW
    semantics: DECOUPLED weight decay applied to the parameter before the
    moment step, then bias-corrected first/second moments). Driver-side
    arithmetic over the small parameter vector; the data-parallel part of
    each step stays the gradient-reduction aggregation."""

    def __init__(self, lr: float, betas: tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8, weight_decay: float = 0.01):
        self.lr, self.betas = lr, betas
        self.eps, self.weight_decay = eps, weight_decay
        self.m: list[float] = []
        self.v: list[float] = []
        self.t = 0

    def step(self, params: list[float], grads: list[float]) -> list[float]:
        if not self.m:
            self.m = [0.0] * len(params)
            self.v = [0.0] * len(params)
        b1, b2 = self.betas
        self.t += 1
        out = []
        for i, (p, g) in enumerate(zip(params, grads)):
            p = p - self.lr * self.weight_decay * p
            self.m[i] = b1 * self.m[i] + (1 - b1) * g
            self.v[i] = b2 * self.v[i] + (1 - b2) * g * g
            mhat = self.m[i] / (1 - b1 ** self.t)
            vhat = self.v[i] / (1 - b2 ** self.t)
            out.append(p - self.lr * mhat / (vhat ** 0.5 + self.eps))
        return out


def _make_stepper(optimizer: str, lr: float, weight_decay: float):
    """(params, grads) -> new params. 'sgd' is plain full-batch GD (no
    decay, the round-1 behavior); 'adamw' matches the reference."""
    if optimizer == "sgd":
        return lambda ps, gs: [p - lr * g for p, g in zip(ps, gs)]
    if optimizer == "adamw":
        opt = AdamW(lr=lr, weight_decay=weight_decay)
        return opt.step
    raise ValueError(f"unknown optimizer {optimizer!r}")


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
                      seed: int = 42, n_batches: int = 1,
                      optimizer: str = "sgd",
                      weight_decay: float = 0.01,
                      split_draw: str = "xxhash64") -> TrainResult:
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
    split = hash_split(examples, val_frac=val_frac, test_frac=0.0, seed=seed,
                       draw=split_draw)
    train = split.filter(F.col("split") == "train").drop("split").cache()
    val = split.filter(F.col("split") == "val").drop("split").cache()
    train.count(), val.count()

    w, b = [0.0] * dim, 0.0
    step = _make_stepper(optimizer, lr, weight_decay)
    result = TrainResult(weights=w, bias=b)
    best = (w, b)
    for epoch in range(epochs):
        if n_batches > 1:
            for bi in range(n_batches):
                batch = train.filter(
                    F.pmod(F.xxhash64("src", "dst", F.lit(seed + epoch)),
                           F.lit(n_batches)) == bi)
                bstats = _epoch_stats(batch, w, b)
                if bstats["n"] == 0:
                    continue
                *w, b = step(w + [b], bstats["gw"] + [bstats["gb"]])
            stats = _epoch_stats(train, w, b)
        else:
            stats = _epoch_stats(train, w, b)
            *w, b = step(w + [b], stats["gw"] + [stats["gb"]])
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


def _proj_epoch_stats(df: DataFrame, Ws: list[list[float]],
                      Wd: list[list[float]], b: float) -> dict:
    """One pass for the per-endpoint-type projection+decoder model
    z = (Ws e_src)·(Wd e_dst) + b (u = Ws e_src, v = Wd e_dst):
    per-(a,b) gradient sums dz/dWs[a][b] = v[a]·e_src[b] and
    dz/dWd[a][b] = u[a]·e_dst[b], plus loss/confusion counts. h² rows
    per edge through two posexplodes — h is single digits, so the
    fan-out is bounded; the shuffle carries only (a, b, partial sums)
    thanks to partial aggregation."""
    h = len(Ws)
    ws_rows = [F.array(*[F.lit(float(x)) for x in row]) for row in Ws]
    wd_rows = [F.array(*[F.lit(float(x)) for x in row]) for row in Wd]
    u = F.array(*[dot(F.col("e_src"), r) for r in ws_rows])
    v = F.array(*[dot(F.col("e_dst"), r) for r in wd_rows])
    z = dot(u, v) + F.lit(float(b))
    p = sigmoid(F.greatest(F.least(z, F.lit(30.0)), F.lit(-30.0)))
    y = F.col("label").cast("double")
    err = (p - y)
    loss = -(y * F.log(p) + (1 - y) * F.log(1 - p))

    scored = df.select(
        F.col("e_src").alias("_es"), F.col("e_dst").alias("_ed"),
        u.alias("_u"), v.alias("_v"), y.alias("y"), err.alias("err"),
        loss.alias("loss"), (p > 0.5).cast("int").alias("yhat"))
    agg = (
        scored
        .select("*", F.posexplode(F.arrays_zip("_u", "_v")).alias("a", "_uv"))
        .select("y", "err", "loss", "yhat", "a", "_uv",
                F.posexplode(F.arrays_zip("_es", "_ed")).alias("bb", "_e"))
        .groupBy("a", "bb")
        .agg(F.sum(F.col("err") * F.col("_uv._v") * F.col("_e._es"))
             .alias("gws"),
             F.sum(F.col("err") * F.col("_uv._u") * F.col("_e._ed"))
             .alias("gwd"),
             F.sum("err").alias("gb"),
             F.sum("loss").alias("loss_sum"),
             F.count("*").alias("n"),
             F.sum((F.col("yhat") == F.col("y").cast("int")).cast("long"))
             .alias("correct"))
        .collect()
    )
    if not agg:
        zero = [[0.0] * h for _ in range(h)]
        return {"gWs": zero, "gWd": [row[:] for row in zero], "gb": 0.0,
                "loss": 0.0, "acc": 0.0, "n": 0}
    cells = {(r.a, r.bb): r for r in agg}
    n = cells[(0, 0)].n
    return {
        "gWs": [[cells[(a, bb)].gws / n for bb in range(h)] for a in range(h)],
        "gWd": [[cells[(a, bb)].gwd / n for bb in range(h)] for a in range(h)],
        "gb": cells[(0, 0)].gb / n,
        "loss": cells[(0, 0)].loss_sum / n,
        "acc": cells[(0, 0)].correct / n,
        "n": n,
    }


def train_link_projection(examples: DataFrame, hidden: int,
                          epochs: int = 10, lr: float = 0.05,
                          val_frac: float = 0.2, seed: int = 42,
                          weight_decay: float = 0.01) -> TrainResult:
    """L5/L6/L9 joint: learn PER-ENDPOINT-TYPE projections Ws, Wd
    (hidden×hidden each) and the decoder bias end-to-end over frozen GNN
    embeddings — score(edge) = (Ws e_src)·(Wd e_dst) + b, BCE loss,
    AdamW updates (model.py:151-152). Separate src/dst weights mirror
    to_hetero's per-type parameterization AND make the bilinear form
    Ws^T Wd arbitrary — a single shared W would force the PSD form
    W^T W, which cannot even represent anti-correlated rules. Training
    the projections jointly with the decoder is real backprop through
    the model's final layer, expressed as the same aggregation-then-
    driver-update shape as the logistic scorer (SURVEY.md §3.2).

    ``examples``: (src, dst, e_src array<double>, e_dst array<double>,
    label int). Identity-initialized projections so epoch 0 scores are
    the raw dot-product decoder. Best-val-accuracy checkpointing (L11).
    ``TrainResult.weights`` is [Ws flattened, Wd flattened].
    """
    split = hash_split(examples, val_frac=val_frac, test_frac=0.0, seed=seed)
    train = split.filter(F.col("split") == "train").drop("split").cache()
    val = split.filter(F.col("split") == "val").drop("split").cache()
    train.count(), val.count()

    eye = [[1.0 if i == j else 0.0 for j in range(hidden)]
           for i in range(hidden)]
    Ws, Wd, b = [r[:] for r in eye], [r[:] for r in eye], 0.0
    opt = AdamW(lr=lr, weight_decay=weight_decay)
    h2 = hidden * hidden

    def flatten(ws, wd, bias):
        return ([x for row in ws for x in row]
                + [x for row in wd for x in row] + [bias])

    result = TrainResult(weights=flatten(Ws, Wd, b)[:-1], bias=b)
    best = (Ws, Wd, b)
    for epoch in range(epochs):
        stats = _proj_epoch_stats(train, Ws, Wd, b)
        gflat = flatten(stats["gWs"], stats["gWd"], stats["gb"])
        new = opt.step(flatten(Ws, Wd, b), gflat)
        Ws = [new[i * hidden:(i + 1) * hidden] for i in range(hidden)]
        Wd = [new[h2 + i * hidden:h2 + (i + 1) * hidden]
              for i in range(hidden)]
        b = new[2 * h2]
        vstats = _proj_epoch_stats(val, Ws, Wd, b)
        result.history.append({
            "epoch": epoch, "train_loss": stats["loss"],
            "train_acc": stats["acc"], "val_loss": vstats["loss"],
            "val_acc": vstats["acc"],
        })
        if vstats["acc"] >= result.best_val_acc:
            result.best_val_acc = vstats["acc"]
            result.best_epoch = epoch
            best = ([r[:] for r in Ws], [r[:] for r in Wd], b)
    Ws, Wd, b = best
    result.weights, result.bias = flatten(Ws, Wd, b)[:-1], b
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
