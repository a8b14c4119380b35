"""F1/G4 — the column-encoder protocol, Spark-native.

Reference (convert_to_graph.py:11-34): ``load_node(df, encoders={col:
encoder})`` where an encoder is any callable column -> tensor, composed
by horizontal concat; only ``IdentityEncoder`` (cast to float) exists.

Here an encoder is any callable ``Column -> Column`` returning either a
scalar double or an ``array<double>``; ``encode_features`` composes a
{col: encoder} dict into one ``features array<double>`` column (the
tensor-row analog). Everything stays a JVM expression — extension
encoders that genuinely need Python should be written as pandas_udfs
with the same Column -> Column signature.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Encoder = Callable[[Column], Column]


def identity_encoder(col: Column) -> Column:
    """IdentityEncoder (C:11-18): numeric passthrough as double."""
    return F.array(col.cast("double"))


def log1p_encoder(col: Column) -> Column:
    """Common magnitude-compressor for heavy-tailed numerics."""
    return F.array(F.log1p(col.cast("double")))


def one_hot_encoder(categories: list[str]) -> Encoder:
    """A6 (C:162 `to_dummies`): fixed-domain one-hot as array<double>."""
    def enc(col: Column) -> Column:
        return F.array(*[
            F.when(col == c, F.lit(1.0)).otherwise(F.lit(0.0))
            for c in categories
        ])
    return enc


def minmax_encoder(lo: float, hi: float) -> Encoder:
    """[-1,1] scaling (the reference normalizes via float cast only, but
    IdentityEncoder's docstring promises [-1,1] — C:12)."""
    def enc(col: Column) -> Column:
        x = (col.cast("double") - lo) / (hi - lo)
        return F.array(x * 2.0 - 1.0)
    return enc


def encode_features(df: DataFrame, encoders: dict[str, Encoder],
                    out_col: str = "features") -> DataFrame:
    """Compose per-column encoders into one array<double> column —
    the `torch.cat(dim=-1)` analog (C:31-33). Column order = dict order,
    matching the reference's dict-iteration semantics."""
    parts = [enc(F.col(c)) for c, enc in encoders.items()]
    if not parts:
        return df.withColumn(out_col, F.array().cast("array<double>"))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return df.withColumn(out_col, out)
