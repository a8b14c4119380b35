"""Bucketed tables — co-located joins without a shuffle.

THE scale lever for repeated big-fact joins: write both sides bucketed
(and sorted) on the join key once, and every subsequent equi-join on
that key is shuffle-free — each task reads bucket i of both tables and
merge-joins locally. At 100 TB this converts the nightly
orders⋈lineitem from a 2×full-table shuffle into a map-side merge,
amortized over every downstream query of the snapshot.

Mechanics: `bucketBy(n, key).sortBy(key).saveAsTable(...)` records the
bucketing in the catalog; Spark's scan then reports the bucket spec as
its output partitioning, so the planner drops both Exchange nodes (and
with sortBy, both Sorts) under the SortMergeJoin —
`tests/test_plans.py::test_bucketed_join_is_shuffle_free` pins exactly
that. Bucket count is chosen once per snapshot (rows/bucket sized to a
task's memory); both sides MUST use the same count or Spark falls back
to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int) -> None:
    """Persist ``df`` as a parquet table bucketed+sorted on
    ``bucket_col`` (overwrites)."""
    (df.write.mode("overwrite").format("parquet")
     .bucketBy(int(num_buckets), bucket_col)
     .sortBy(bucket_col)
     .saveAsTable(table))


def cobucket_pair(spark: SparkSession, left: DataFrame, right: DataFrame,
                  key_left: str, key_right: str, num_buckets: int,
                  prefix: str = "cobkt") -> tuple[DataFrame, DataFrame]:
    """Write both frames bucketed on their join keys with one shared
    bucket count, and return the catalog-backed reads whose scans carry
    the bucket spec (join them on the keys for a shuffle-free plan)."""
    lt, rt = f"{prefix}_l", f"{prefix}_r"
    write_bucketed(left, lt, key_left, num_buckets)
    write_bucketed(right, rt, key_right, num_buckets)
    return spark.table(lt), spark.table(rt)
