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
