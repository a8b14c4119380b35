"""L12/S12 — hyperparameter search + persistent study storage
(tuning.py:8-51 analog).

Reference: 100 Optuna TPE trials over the space at tuning.py:11-15
(log-uniform learning_rate 1e-6..0.01 + four categoricals), objective =
max val best_accuracy, persisted to sqlite ('gnn_studies.db',
load_if_exists=True — tuning.py:41-48). Spark-native re-expression:

  * the trial EXECUTION is a driver-side call into the real training
    loop against the SAME cached examples frame — feature building (the
    expensive, data-parallel part) is paid once, not per trial;
  * the SAMPLER is a deterministic TPE: trials are split into good/bad
    by objective (γ quantile), each parameter gets a Parzen density per
    side (Gaussian kernels in the log domain for log-floats,
    Laplace-smoothed counts for categoricals), and the next trial is
    the argmax of l(x)/g(x) over a quasirandom candidate stream (the
    R_d low-discrepancy sequence — deterministic, so the whole study is
    reproducible bit-for-bit, unlike Optuna's RNG-driven TPE);
  * the STUDY is persisted after every trial as a JSON file
    (load_if_exists resume semantics — the sqlite analog without a new
    dependency).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from rel_db_to_graph_spark.ml.train import TrainResult, train_edge_scorer

#: the reference's exact search space (tuning.py:11-15)
REFERENCE_SPACE: dict[str, tuple] = {
    "learning_rate": ("log_float", 1e-6, 0.01),
    "num_neighbors": ("categorical", list(range(5, 55, 5))),
    "num_layers": ("categorical", [2, 3, 4, 5, 6]),
    "hidden_channels": ("categorical", list(range(10, 110, 10))),
    "dropout": ("categorical", [d / 100 for d in range(5, 55, 5)]),
}


# ------------------------------------------------------------ deterministic TPE

def _rd_stream(dim: int, seed: int):
    """Roberts' R_d quasirandom sequence: x_i[k] = frac(i * phi_d^-(k+1))
    — deterministic, well-spread points in the unit cube."""
    phi = 2.0
    for _ in range(32):
        phi = (1 + phi) ** (1 / (dim + 1))
    alphas = [(1 / phi) ** (k + 1) % 1.0 for k in range(dim)]
    i = 1 + seed
    while True:
        yield [((i * a) + 0.5) % 1.0 for a in alphas]
        i += 1


def _materialize(space: dict[str, tuple], unit: list[float]) -> dict:
    out = {}
    for (name, spec), u in zip(space.items(), unit):
        if spec[0] == "log_float":
            lo, hi = math.log(spec[1]), math.log(spec[2])
            out[name] = math.exp(lo + u * (hi - lo))
        elif spec[0] == "categorical":
            cats = spec[1]
            out[name] = cats[min(int(u * len(cats)), len(cats) - 1)]
        else:
            raise ValueError(f"unknown spec {spec[0]!r}")
    return out


def _log_parzen(space: dict[str, tuple], obs: list[dict], params: dict) -> float:
    """log density of ``params`` under the Parzen model fit to ``obs``."""
    total = 0.0
    n = len(obs)
    for name, spec in space.items():
        if spec[0] == "log_float":
            lo, hi = math.log(spec[1]), math.log(spec[2])
            bw = max((hi - lo) * 1.06 * n ** -0.2, 1e-6)
            x = math.log(params[name])
            dens = sum(
                math.exp(-0.5 * ((x - math.log(o[name])) / bw) ** 2)
                / (bw * math.sqrt(2 * math.pi)) for o in obs) / n
            total += math.log(max(dens, 1e-300))
        else:
            cats = spec[1]
            cnt = sum(1 for o in obs if o[name] == params[name])
            total += math.log((cnt + 1.0) / (n + len(cats)))
    return total


def suggest_tpe(space: dict[str, tuple], trials: list[tuple[dict, float]],
                seed: int = 42, n_startup: int = 5, gamma: float = 0.25,
                n_candidates: int = 24) -> dict:
    """Next parameter set: quasirandom during startup, then argmax of
    l(x)/g(x) over a fresh candidate batch (l = Parzen fit to the top-γ
    trials, g = fit to the rest). Pure function of (space, trials, seed)."""
    stream = _rd_stream(len(space), seed)
    drawn = [next(stream) for _ in range(max(len(trials) + 1, n_startup)
                                        + n_candidates)]
    if len(trials) < n_startup:
        return _materialize(space, drawn[len(trials)])
    ranked = sorted(trials, key=lambda t: -t[1])
    n_good = max(1, int(gamma * len(ranked)))
    good = [t[0] for t in ranked[:n_good]]
    bad = [t[0] for t in ranked[n_good:]] or good
    best, best_score = None, -math.inf
    for unit in drawn[-n_candidates:]:
        cand = _materialize(space, unit)
        score = (_log_parzen(space, good, cand)
                 - _log_parzen(space, bad, cand))
        if score > best_score:
            best, best_score = cand, score
    return best


# ------------------------------------------------------------ persistent study

@dataclass
class Study:
    """S12 — persistent study storage (sqlite analog, tuning.py:41-48):
    one JSON file per study, written after every completed trial,
    load_if_exists resume."""

    name: str
    path: str | None = None
    trials: list[dict] = field(default_factory=list)

    @classmethod
    def load_or_create(cls, name: str, path: str | None = None) -> "Study":
        if path and os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            if data.get("name") != name:
                raise ValueError(
                    f"study file {path} holds study {data.get('name')!r}, "
                    f"not {name!r}")
            return cls(name=name, path=path, trials=data["trials"])
        return cls(name=name, path=path)

    def add_trial(self, params: dict, value: float) -> None:
        self.trials.append({"number": len(self.trials),
                            "params": params, "value": value})
        if self.path:
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"name": self.name, "trials": self.trials}, f,
                          indent=1, sort_keys=True)
            os.replace(tmp, self.path)

    def observations(self) -> list[tuple[dict, float]]:
        return [(t["params"], t["value"]) for t in self.trials]

    @property
    def best_trial(self) -> dict:
        return max(self.trials, key=lambda t: t["value"])

    @property
    def best_value(self) -> float:
        return self.best_trial["value"]

    @property
    def best_params(self) -> dict:
        return self.best_trial["params"]


def optimize(objective, space: dict[str, tuple], n_trials: int,
             study: Study | None = None, seed: int = 42) -> Study:
    """study.optimize analog: repeatedly suggest (TPE) -> evaluate ->
    record+persist, resuming from any already-recorded trials."""
    study = study or Study(name="adhoc")
    while len(study.trials) < n_trials:
        params = suggest_tpe(space, study.observations(), seed=seed)
        study.add_trial(params, float(objective(params)))
    return study


# ------------------------------------------------------- trial executors

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
                seed: int = 42, sampler: str = "halton",
                study_path: str | None = None,
                study_name: str = "edge_scorer") -> StudyResult:
    """Run ``n_trials`` trials of the REAL train loop over cached
    examples. sampler='halton' is the round-1 deterministic sweep;
    sampler='tpe' runs the deterministic TPE over (lr log-uniform
    1e-4..3.0, epochs in {3,5,7}) with optional persistent study
    storage (``study_path``)."""
    examples = examples.cache()
    examples.count()
    study = StudyResult()
    if sampler == "halton":
        plan = _candidates(n_trials, seed)
        for params in plan:
            res = train_edge_scorer(examples, dim=dim,
                                    epochs=params["epochs"],
                                    lr=params["lr"], seed=seed)
            study.trials.append(Trial(params=params, result=res))
    elif sampler == "tpe":
        space = {"lr": ("log_float", 1e-4, 3.0),
                 "epochs": ("categorical", [3, 5, 7])}
        store = Study.load_or_create(study_name, study_path)

        def run(params: dict) -> float:
            res = train_edge_scorer(examples, dim=dim,
                                    epochs=params["epochs"],
                                    lr=params["lr"], seed=seed)
            study.trials.append(
                Trial(params={"lr": params["lr"],
                              "epochs": params["epochs"]}, result=res))
            return res.best_val_acc

        optimize(run, space, n_trials, study=store, seed=seed)
        # on resume, earlier trials exist in the store but not in this
        # process — rerun objective-free bookkeeping is unnecessary;
        # StudyResult carries the trials executed here, the Study file
        # carries all of them
    else:
        raise ValueError(f"unknown sampler {sampler!r}")
    examples.unpersist()
    return study
