"""Compaction/layout maintenance (sources/layout.py): size-targeted
range-clustered rewrite — the small-files fix a 100 TB ingestion
pipeline runs continuously."""

from __future__ import annotations

import glob
import tempfile

from rel_db_to_graph_spark.sources.catalog import load_table
from rel_db_to_graph_spark.sources.layout import (
    compact_sorted,
    layout_stats,
)
from tests.conftest import SF_SMOKE


def test_compact_sorted_clusters_and_bounds_files(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/docs_compacted"
        compact_sorted(docs, ["doc_id"], out, n_files=4)
        files = [f for f in glob.glob(f"{out}/*.parquet")]
        assert 1 <= len(files) <= 4
        stats = layout_stats(spark, out, "doc_id").collect()
        assert sum(r.n_rows for r in stats) == docs.count()
        # non-overlapping sort-key ranges across files = real clustering
        spans = sorted((r.key_min, r.key_max) for r in stats)
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, spans
        # readback preserves content exactly
        assert (spark.read.parquet(out).exceptAll(docs).count() == 0)
        assert (docs.exceptAll(spark.read.parquet(out)).count() == 0)


def test_compact_plan_has_no_single_partition_sort(spark):
    """The clustering must be a RangePartitioning exchange (sampled
    boundaries, parallel), never a global single-partition sort."""
    docs = load_table(spark, SF_SMOKE, "documents")
    from pyspark.sql import functions as F
    staged = (docs.repartitionByRange(4, F.col("doc_id"))
              .sortWithinPartitions("doc_id"))
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(doc_id" in plan.lower(), plan
    # `Sort [...], false, 0` = global=false (partition-local sort only)
    assert "Sort [doc_id" in plan and "], false, 0" in plan, plan


def test_zorder_compaction_clusters_both_dimensions(spark):
    """Compacting by the Morton key keeps BOTH dimensions' per-file
    spans tight — the property that makes parquet min/max stats prune
    scans filtering on either column. A single-column sort would leave
    the other dimension's per-file span at ~full range."""
    from pyspark.sql import functions as F

    from rel_db_to_graph_spark.functions.zorder import zorder_key
    from rel_db_to_graph_spark.sources.catalog import load_table as lt
    from rel_db_to_graph_spark.sources.layout import compact_sorted

    p = (lt(spark, SF_SMOKE, "part")
         .select("p_partkey", "p_size",
                 F.pmod(F.col("p_partkey"), F.lit(64)).alias("bucket"))
         .withColumn("zkey", zorder_key(F.col("p_size"),
                                        F.col("bucket"), bits=7)))
    full_size = p.agg(F.max("p_size") - F.min("p_size")).collect()[0][0]
    full_bucket = p.agg(F.max("bucket") - F.min("bucket")).collect()[0][0]
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/part_z"
        compact_sorted(p, ["zkey"], out, n_files=4)
        spans = (spark.read.parquet(out)
                 .groupBy(F.input_file_name().alias("f"))
                 .agg((F.max("p_size") - F.min("p_size")).alias("s_span"),
                      (F.max("bucket") - F.min("bucket")).alias("b_span"))
                 .collect())
    assert len(spans) >= 2
    # average per-file span strictly tighter than the full range on
    # BOTH dimensions (z-curve locality)
    avg_s = sum(r.s_span for r in spans) / len(spans)
    avg_b = sum(r.b_span for r in spans) / len(spans)
    assert avg_s < full_size, (avg_s, full_size)
    assert avg_b < full_bucket, (avg_b, full_bucket)


def test_zorder_key_is_invertible(spark):
    """Morton interleave is a bijection on the bit domain: distinct
    (c1, c2) pairs -> distinct keys (no information loss)."""
    from pyspark.sql import functions as F

    from rel_db_to_graph_spark.functions.zorder import zorder_key

    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key(F.col("a"), F.col("b"), bits=5))
    assert df.select("z").distinct().count() == len(rows)
    assert df.agg(F.max("z")).collect()[0][0] == 1023
