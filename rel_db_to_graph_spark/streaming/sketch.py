"""Streaming count-min sketch — heavy-hitter counting over an unbounded
stream with FIXED state, the sketch the batch tier
(operators/stats.py::cms_counters) was designed to share.

Why this is the natural streaming shape: a streaming groupBy on the
raw term would grow state with the vocabulary (unbounded on web text);
grouping on the sketch CELL keys the state at exactly depth x width
rows forever — the CMS guarantee (est >= exact, error <= eN with prob
1-delta) survives incremental updates because cell counts are pure
sums. Update-mode output emits refreshed cells per micro-batch; the
final table IS ``cms_counters`` of everything ingested (pinned by the
stream-vs-batch test).

The term-cell fan-out reuses the batch operator's hash family
(stats.py::cms_hash) so a stream-built sketch and a batch-built sketch
are interchangeable — you can seed a streaming job from a batch
backfill sketch by summing cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.stats import cms_hash
from rel_db_to_graph_spark.operators.text import normalize, tokens


def cms_cells_stream(docs_stream: DataFrame, width: int = 256,
                     depth: int = 4, text_col: str = "text") -> DataFrame:
    """(row, bucket, cnt) streaming aggregate — state is depth*width
    cells regardless of how much text flows through. No watermark: the
    sketch is a running total by design (cells never expire)."""
    terms = (docs_stream
             .select(F.explode(tokens(normalize(F.col(text_col))))
                     .alias("term"))
             .filter(F.col("term") != ""))
    cells = F.explode(F.array(*[
        F.struct(F.lit(d).alias("row"),
                 cms_hash(F.col("term"), d, width).alias("bucket"))
        for d in range(depth)]))
    return (terms.select(cells.alias("rb"))
            .select("rb.row", "rb.bucket")
            .groupBy("row", "bucket").agg(F.count("*").alias("cnt")))
