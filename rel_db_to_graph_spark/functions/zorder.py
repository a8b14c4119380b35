"""Z-order (Morton) interleaved-bit keys as pure codegen expressions.

Sorting/range-partitioning by a Morton key clusters rows so that BOTH
source columns have tight per-file/row-group min-max spans — the
standard multi-dimensional layout trick (Delta/Iceberg OPTIMIZE ZORDER)
for making parquet statistics prune on more than one filter column.

Built from shiftright/bitwise-and/shiftleft only: whole-stage codegen,
no UDF, and bit-identical in any engine with integer bit ops (the
DuckDB oracle twin uses the same expression shape).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns:
    bit i of c1 -> bit 2i, bit i of c2 -> bit 2i+1. 2*bits <= 62."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    a = c1.cast("long")
    b = c2.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (out
               .bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
               .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)))
    return out
