"""Skew-aware join helper — salting for hot keys.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the plan-level
complement for the pathological case AQE can't fix: a single join key
with billions of rows (the celebrity-node problem in graph workloads).

``salted_join(big, small, key, salt)``: the big side gets a random-ish
salt in [0, salt) derived from xxhash64 of its row (deterministic), the
small side is exploded ``salt``× with every salt value, and the join key
becomes (key, salt) — the hot key's rows spread over ``salt`` reducers.
Cost: small side inflates ``salt``×; use only when a profile shows a hot
key, and keep ``salt`` ~ the skew factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], salt: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, salt) from the row's columns."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]),
                         F.lit(salt)).cast("int"))


def explode_salt(df: DataFrame, salt: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate every row once per salt value (the small side)."""
    return df.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the hot-key rows of ``big`` spread over ``salt``
    partitions. Result equals ``big.join(small, on, how)`` for
    how='inner'/'left' ONLY: the small side is exploded salt× before the
    join, so a right/full join would emit unmatched small-side rows
    ``salt`` times each. Those modes are rejected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: the "
            "small side is exploded salt x, so outer modes would "
            "duplicate unmatched small-side rows")
    b = with_salt(big, list(big.columns), salt)   # full row: hot KEYS still spread
    s = explode_salt(small, salt)
    return b.join(s, on + ["_salt"], how).drop("_salt")
