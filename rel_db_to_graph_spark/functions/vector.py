"""Vector math on ``array<float>`` / ``array<double>`` columns — JVM-side.

All of these stay inside whole-stage codegen (higher-order functions, no
Python): the dot product over a 64-dim embedding column is ~3 ns/element in
codegen vs ~1 us/element through a row-at-a-time Python UDF. This is the
L6 decoder math (model.py:47-81 dot + sigmoid) re-expressed declaratively.

Determinism note: ``F.aggregate`` folds left sequentially per row, so
float summation order is fixed — per-row results are bit-stable across
runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + fold (no shuffle, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sigmoid(x: Column) -> Column:
    """Edge-decoder probability (model.py:81)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def sign_bucket(vec: Column, n_bits: int) -> Column:
    """LSH bucket id from the sign bits of the first ``n_bits`` dims.

    A deterministic, shuffle-friendly coarse partitioner for ANN /
    embedding dedup: same-bucket vectors land in the same join bucket, so
    the candidate-pair join is an equi-join Catalyst can hash-partition —
    no all-pairs cross join at scale.
    """
    b = F.lit(0)
    for d in range(n_bits):
        b = b + F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << d)).otherwise(F.lit(0))
    return b
