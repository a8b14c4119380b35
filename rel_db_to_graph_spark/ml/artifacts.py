"""S10/S11 — model-checkpoint and metrics sinks.

Reference: Lightning ModelCheckpoint keeps the best weights file
(train.py:63-68); DVCLive writes metrics.json + per-step plots
(train.py:70/85, dvc.yaml:33-38). Spark-native: parameters are a 1-row
json document, metric history is a DataFrame written as json — both land
next to the graph parquet so one directory is the full run artifact.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from rel_db_to_graph_spark.ml.train import TrainResult


def save_checkpoint(result: TrainResult, out_dir: str) -> str:
    """Best-epoch parameters + summary as checkpoint.json (S10 sink)."""
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/checkpoint.json"
    with open(path, "w") as f:
        json.dump({
            "weights": result.weights,
            "bias": result.bias,
            "best_epoch": result.best_epoch,
            "best_val_acc": result.best_val_acc,
        }, f)
    return path


def load_checkpoint(path: str) -> TrainResult:
    """S10 source: load_from_checkpoint analog (inference.py:30-36)."""
    with open(path) as f:
        d = json.load(f)
    return TrainResult(weights=d["weights"], bias=d["bias"],
                       best_epoch=d["best_epoch"],
                       best_val_acc=d["best_val_acc"])


def metrics_frame(spark: SparkSession, result: TrainResult) -> DataFrame:
    """Per-epoch metric history as a DataFrame (L8)."""
    return spark.createDataFrame(
        [(h["epoch"], float(h["train_loss"]), float(h["train_acc"]),
          float(h["val_loss"]), float(h["val_acc"])) for h in result.history],
        "epoch int, train_loss double, train_acc double, "
        "val_loss double, val_acc double")


def save_metrics(spark: SparkSession, result: TrainResult, out_dir: str) -> None:
    """DVCLive-style metrics sink (S11): json lines per epoch."""
    metrics_frame(spark, result).coalesce(1).write.mode("overwrite") \
        .json(f"{out_dir}/metrics")
