"""Data-layout maintenance for training-data lakes: size-targeted,
sort-clustered parquet rewrite (the compaction step every long-running
100 TB ingestion pipeline needs once small incremental writes
accumulate).

Spark-first shape: ``repartitionByRange`` (sampled range boundaries —
a 2-pass exchange, never a single-partition global sort) fixes the
file COUNT and the cross-file clustering; ``sortWithinPartitions``
fixes the within-file ordering so parquet row-group min/max stats
become selective — after compaction, a reader filtering on the sort
key prunes whole files + row groups instead of scanning everything.

No UDFs, no driver data paths: the only driver-side numbers are the
input byte size (from the file catalog, not the data) and the derived
partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_file_count(spark: SparkSession, src_dir: str,
                    target_file_mb: int = 512) -> int:
    """Partition count from the CATALOG's total byte size (a driver
    metadata call — no data job), so compaction writes ~target-sized
    files regardless of input fragmentation."""
    # in-memory relation of file statuses; no scan of the data itself
    jvm_files = (spark.read.parquet(src_dir)
                 .inputFiles())
    import os
    total = sum(os.path.getsize(p.replace("file:", "")) for p in jvm_files)
    return max(1, round(total / (target_file_mb * 1024 * 1024)))


def compact_sorted(df: DataFrame, sort_cols: list[str], out_dir: str,
                   n_files: int) -> None:
    """Rewrite ``df`` as ``n_files`` range-clustered, internally sorted
    parquet files. Range exchange + local sort: the same volume a plain
    repartition shuffles, plus a sampling pass for the boundaries —
    there is no cheaper way to get globally clustered output."""
    (df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
       .sortWithinPartitions(*sort_cols)
       .write.mode("overwrite").parquet(out_dir))


def layout_stats(spark: SparkSession, out_dir: str,
                 sort_col: str) -> DataFrame:
    """Post-compaction audit: one row per output file with its row
    count and sort-key min/max — non-overlapping [min, max] ranges
    across files == the clustering actually happened (what makes
    row-group pruning effective). Runs as one metadata-cheap scan
    grouped by input_file_name."""
    d = spark.read.parquet(out_dir)
    return (d.groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("n_rows"),
                 F.min(sort_col).alias("key_min"),
                 F.max(sort_col).alias("key_max")))
