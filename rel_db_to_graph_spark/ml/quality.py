"""Model-based document quality filtering — a logistic-regression
classifier TRAINED distributively (IRLS / Newton as DataFrame
aggregations), then applied as a map-only scoring pass. This is the
learned tier above the heuristic ``operators/text.py::quality_score``:
real LLM pipelines (CCNet's fastText filter, GPT-3/LLaMA's
"looks-like-reference-corpus" linear classifiers) score every document
with a small trained model, because hand-set thresholds stop scaling
past a few heuristics.

Optimizer choice is deliberately Spark-shaped: on a cluster each data
pass is a JOB, so first-order GD (thousands of cheap passes — fine on
one machine) is the wrong algorithm; IRLS converges in < 10 passes,
and each pass reduces to ONE aggregation emitting the 5x5 weighted
Gram matrix Σ wᵢ aᵢaᵢᵀ and gradient Σ (yᵢ−pᵢ)aᵢ — 20 sums — after
which the Newton solve is driver-side arithmetic on a 5x5 system.
Ridge λ keeps the (linearly separable) problem bounded. 100 TB
profile: iterations × one map+reduce over the corpus; no shuffle of
row data, ever.

Features are centered/scaled by FIXED a-priori constants (part of the
model definition, not data statistics) so the Newton system is well-
conditioned AND the scoring plan stays a constant, oracle-checkable
expression. Training target distills the heuristic rule
``quality_score(text) > 0.5`` (linear in this feature space by
construction, so LR provably can recover it; tests pin that accuracy
clears the majority-class base rate by a wide margin). Swap the label
column for human ratings in production; the dataflow is identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.functions.vector import sigmoid
from rel_db_to_graph_spark.operators.text import (
    STOPWORDS,
    marker_hits,
    normalize,
    punct_ratio,
    quality_score,
    tokens,
)

QUALITY_DIM = 4

# Weights learned by ``train_quality_irls(documents at sf0.01)`` —
# pinned so scoring is a constant plan (reproduction pinned by
# tests/test_quality.py::test_pinned_weights_match_training). Order
# matches _feature_cols: [avg_word_len-4.5, 5*stop_ratio,
# 5*punct_ratio, tokens/100-0.5]; last entry of the solve is the bias.
PINNED_WEIGHTS = [19.708035, 18.555989, 0.0, -0.967624]
PINNED_BIAS = -10.032847


@dataclass
class QualityModel:
    weights: list[float]
    bias: float
    history: list[dict] = field(default_factory=list)


def _feature_cols(text: Column) -> list[Column]:
    norm = normalize(text)
    toks = tokens(norm)
    n_tok = F.size(toks)
    return [
        (F.length(F.replace(norm, F.lit(" "), F.lit(""))) / n_tok
         - F.lit(4.5)),
        F.lit(5.0) * (marker_hits(toks, STOPWORDS) / n_tok),
        F.lit(5.0) * punct_ratio(text),
        (n_tok.cast("double") / F.lit(100.0) - F.lit(0.5)),
    ]


def doc_features(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, features array<double>, label int) — the training frame.
    label distills the heuristic quality rule (swap-in point for human
    labels)."""
    return docs.select(
        F.col(id_col),
        F.array(*_feature_cols(F.col(text_col))).alias("features"),
        (quality_score(F.col(text_col)) > 0.5).cast("int").alias("label"),
    )


def train_quality_irls(docs: DataFrame, iters: int = 12,
                       ridge: float = 1e-4, text_col: str = "text",
                       id_col: str = "doc_id") -> QualityModel:
    """IRLS logistic regression. Per iteration ONE aggregation job
    computes the weighted Gram matrix and gradient of the augmented
    design [features, 1]; the 5x5 Newton solve runs on the driver."""
    import numpy as np

    d = QUALITY_DIM + 1      # + bias
    feats = doc_features(docs, text_col, id_col).cache()
    n = feats.count()

    beta = [0.0] * d
    model = QualityModel(weights=beta[:-1], bias=0.0)
    for it in range(iters):
        wlit = F.array(*[F.lit(float(x)) for x in beta[:-1]])
        z = (F.aggregate(F.zip_with(F.col("features"), wlit,
                                    lambda a, b: a * b),
                         F.lit(0.0), lambda acc, x: acc + x)
             + F.lit(float(beta[-1])))
        z = F.greatest(F.least(z, F.lit(30.0)), F.lit(-30.0))
        p = sigmoid(z)
        y = F.col("label").cast("double")
        rowed = feats.select(
            F.concat(F.col("features"), F.array(F.lit(1.0))).alias("a"),
            (p * (1 - p)).alias("w"), (y - p).alias("r"),
            ((p > 0.5).cast("int") == F.col("label")).cast("long")
            .alias("ok"))
        aggs = [F.sum(F.col("w") * F.element_at("a", i + 1)
                      * F.element_at("a", j + 1)).alias(f"h_{i}_{j}")
                for i in range(d) for j in range(i, d)]
        aggs += [F.sum(F.col("r") * F.element_at("a", i + 1))
                 .alias(f"g_{i}") for i in range(d)]
        aggs.append(F.sum("ok").alias("correct"))
        row = rowed.agg(*aggs).collect()[0]

        H = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"] / n
        g = np.array([row[f"g_{i}"] / n for i in range(d)])
        H += ridge * np.eye(d)
        g -= ridge * np.array(beta)
        beta = list(np.array(beta) + np.linalg.solve(H, g))
        model.history.append({"iter": it, "acc": row["correct"] / n})
    feats.unpersist()
    model.weights, model.bias = [float(x) for x in beta[:-1]], float(beta[-1])
    return model


def score_quality(docs: DataFrame, weights: list[float] | None = None,
                  bias: float | None = None, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, quality_p rounded to 6 dp) — map-only scoring with the
    classifier folded into the plan as literals. Defaults to the pinned
    trained weights."""
    w = PINNED_WEIGHTS if weights is None else weights
    b = PINNED_BIAS if bias is None else bias
    feats = _feature_cols(F.col(text_col))
    z = F.lit(float(b))
    for wi, fi in zip(w, feats):
        z = z + F.lit(float(wi)) * fi
    z = F.greatest(F.least(z, F.lit(30.0)), F.lit(-30.0))
    return docs.select(F.col(id_col),
                       F.round(sigmoid(z), 6).alias("quality_p"))
