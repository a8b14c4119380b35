"""L12 — hyperparameter search (tuning.py:8-51 analog).

Reference: 100 Optuna TPE trials, each a `dvc exp run` subprocess, with
the objective read back from experiment tracking. Spark-native: each
trial is a driver-side call into the training loop against the SAME
cached examples frame (the expensive part — feature building — is paid
once, not per trial); the search itself is deterministic grid/halton
sampling over the reference's space shape (tuning.py:11-15). A TPE
optimizer can drop in by replacing ``_candidates`` — the trial
execution shape is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from rel_db_to_graph_spark.ml.train import TrainResult, train_edge_scorer


@dataclass
class Trial:
    params: dict
    result: TrainResult

    @property
    def objective(self) -> float:
        """maximize val best-accuracy (tuning.py:33-37)."""
        return self.result.best_val_acc


@dataclass
class StudyResult:
    trials: list[Trial] = field(default_factory=list)

    @property
    def best(self) -> Trial:
        return max(self.trials,
                   key=lambda t: (t.objective, -t.params["lr"]))


def _candidates(n_trials: int, seed: int) -> list[dict]:
    """Deterministic low-discrepancy sweep over the reference's space
    shape: lr log-spaced (tuning.py:11), epochs stepped."""
    out = []
    for i in range(n_trials):
        # golden-ratio scrambled unit points — deterministic, well spread
        u = ((i + 1) * 0.6180339887498949 + seed * 0.1031) % 1.0
        lr = 10 ** (-3 + 3.5 * u)          # 1e-3 .. ~3
        epochs = 3 + (i % 3) * 2
        out.append({"lr": round(lr, 6), "epochs": epochs})
    return out


def grid_search(examples: DataFrame, dim: int, n_trials: int = 6,
                seed: int = 42) -> StudyResult:
    """Run ``n_trials`` deterministic trials over cached examples; returns
    every trial + the best by val accuracy."""
    examples = examples.cache()
    examples.count()
    study = StudyResult()
    for params in _candidates(n_trials, seed):
        res = train_edge_scorer(examples, dim=dim, epochs=params["epochs"],
                                lr=params["lr"], seed=seed)
        study.trials.append(Trial(params=params, result=res))
    examples.unpersist()
    return study
