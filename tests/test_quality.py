"""Trained quality classifier (ml/quality.py): IRLS learns past the
majority-class base rate, matches a numpy twin, and the pinned scoring
weights reproduce training. Oracle parity for ``quality_lr_score`` runs
in test_oracle_parity via the driver inventory."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rel_db_to_graph_spark.ml.quality import (
    PINNED_BIAS,
    PINNED_WEIGHTS,
    doc_features,
    score_quality,
    train_quality_irls,
)
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE


def _numpy_irls(X, y, iters, ridge):
    A = np.hstack([X, np.ones((len(X), 1))])
    beta = np.zeros(A.shape[1])
    for _ in range(iters):
        z = np.clip(A @ beta, -30, 30)
        p = 1 / (1 + np.exp(-z))
        w = p * (1 - p)
        H = A.T @ (A * w[:, None]) / len(y) + ridge * np.eye(A.shape[1])
        g = A.T @ (y - p) / len(y) - ridge * beta
        beta = beta + np.linalg.solve(H, g)
    return beta


def test_irls_learns_past_base_rate(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    feats = doc_features(docs)
    n = feats.count()
    pos = feats.filter("label = 1").count()
    base = max(pos, n - pos) / n
    m = train_quality_irls(docs, iters=8)
    assert m.history[-1]["acc"] >= base + 0.05
    assert m.history[-1]["acc"] >= m.history[0]["acc"]


def test_irls_matches_numpy_twin(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = doc_features(docs).collect()
    X = np.array([r.features for r in rows])
    y = np.array([r.label for r in rows], float)
    beta = _numpy_irls(X, y, iters=6, ridge=1e-4)
    m = train_quality_irls(docs, iters=6, ridge=1e-4)
    got = np.array(m.weights + [m.bias])
    assert np.allclose(got, beta, rtol=1e-4, atol=1e-4), (got, beta)


def test_pinned_weights_match_training(spark):
    """The committed PINNED_WEIGHTS are exactly what training at sf0.01
    produces (guards against drift between the constant and the code)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    m = train_quality_irls(docs)      # the documented reproduction
    got = np.array(m.weights + [m.bias])
    want = np.array(PINNED_WEIGHTS + [PINNED_BIAS])
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5), (got, want)


def test_score_matches_manual_sigmoid(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    scored = {r.doc_id: r.quality_p for r in score_quality(docs).collect()}
    rows = doc_features(docs).collect()
    X = np.array([r.features for r in rows])
    z = np.clip(X @ np.array(PINNED_WEIGHTS) + PINNED_BIAS, -30, 30)
    p = 1 / (1 + np.exp(-z))
    for r, pi in zip(rows, p):
        assert abs(scored[r.doc_id] - round(pi, 6)) <= 1e-6
    assert all(0.0 <= v <= 1.0 for v in scored.values())
    # the learned filter is selective, not degenerate
    kept = sum(v > 0.5 for v in scored.values())
    assert 0 < kept < len(scored)


def test_irls_oracle_generator_matches_numpy_twin():
    """The DuckDB retraining twin (oracle.py::_quality_lr_train_sql)
    replays the Newton loop on a toy corpus — pure DuckDB vs numpy
    IRLS over python-computed features, no Spark. Accuracy history is
    integer-derived, so the generated Gaussian elimination only has to
    agree with LAPACK on each iteration's decision boundary."""
    import re

    import duckdb

    from rel_db_to_graph_spark.oracle import _quality_lr_train_sql
    from rel_db_to_graph_spark.operators.text import STOPWORDS

    rows = [
        (0, "the quick brown fox jumps over the lazy dog in the yard"),
        (1, "??!! ### @@@ ;;; ::: !!!"),
        (2, "a of to in is and or the an a of to in is and or the an"),
        (3, "short"),
        (4, "numbers 123 456 789 and words mixed to make it is longer"),
        (5, "%%% $$$ ^^^ &&& *** ((( )))"),
        (6, "this is a perfectly ordinary sentence of medium length"),
        (7, "x" * 300),
    ]

    def feats(text):
        norm = re.sub(r" +", " ",
                      re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
        toks = norm.split(" ")
        n_tok = len(toks)
        punct = len(re.sub(r"[a-zA-Z0-9 ]", "", text)) / len(text)
        avg_len = len(norm.replace(" ", "")) / n_tok
        stop = sum(t in STOPWORDS for t in toks) / n_tok
        return [avg_len - 4.5, 5.0 * stop, 5.0 * punct,
                n_tok / 100.0 - 0.5], (
            1 / (1 + np.exp(-(0.4 * avg_len + 2.0 * stop - 5.0 * punct
                              - 2.0))) > 0.5)

    X = np.array([feats(t)[0] for _, t in rows])
    y = np.array([float(feats(t)[1]) for _, t in rows])
    A = np.hstack([X, np.ones((len(X), 1))])
    beta, want = np.zeros(A.shape[1]), []
    for it in range(6):
        z = np.clip(A @ beta, -30, 30)
        p = 1 / (1 + np.exp(-z))
        want.append((it, float(np.mean((p > 0.5) == (y > 0.5)))))
        H = (A.T @ (A * (p * (1 - p))[:, None]) / len(y)
             + 1e-4 * np.eye(A.shape[1]))
        g = A.T @ (y - p) / len(y) - 1e-4 * beta
        beta = beta + np.linalg.solve(H, g)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = con.execute(_quality_lr_train_sql()).fetchall()
    assert [(it, round(acc, 12)) for it, acc in got] == \
        [(it, round(acc, 12)) for it, acc in want]
