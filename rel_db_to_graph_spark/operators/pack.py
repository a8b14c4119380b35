"""Token-budget sequence packing — the concat-then-chunk step of an LLM
pretraining pipeline: lay every document's tokens end-to-end in a
deterministic global order, cut the stream every ``budget`` tokens, and
record which chunk(s) each document lands in.

Semantics (the standard packed-pretraining shape): documents are NOT
bin-packed greedily (that is sequentially dependent and order-fragile);
they are concatenated in a canonical order and split at exact budget
boundaries, so a document may straddle chunks — first_chunk/last_chunk
report the span. Deterministic: a pure function of (doc set, budget).

Scale shape — the same no-total-sort trick as
graph_build.dense_ids_scalable, generalised from counts to SUMS:

  * canonical order = (md5-bucket(key), key). A global
    ``sum() OVER (ORDER BY key)`` would be a single-partition sort (the
    100x scale-killer); instead
      1. one shuffle on the md5 bucket,
      2. per-bucket window computes the in-bucket exclusive token cumsum
         AND the bucket's token total in one stage,
      3. exclusive prefix sum over the num_buckets totals (a window over
         64 rows, not over the data), broadcast-joined back — Catalyst
         reuses the step-1 exchange for the offsets branch.
  * start offset = bucket token offset + in-bucket cumsum: identical to
    ``sum(tokens) OVER (ORDER BY bucket, key ROWS UNBOUNDED PRECEDING
    EXCLUDE CURRENT)`` — which is exactly the DuckDB oracle, affordable
    at test SF.

Chunk arithmetic stays in longs (floor division) — no float rounding to
diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.graph_build import (
    DEFAULT_ID_BUCKETS,
    hash_bucket,
)


def pack_documents(df: DataFrame, token_col: str, key_col: str,
                   budget: int,
                   num_buckets: int = DEFAULT_ID_BUCKETS) -> DataFrame:
    """(key, n_tokens, start_offset, first_chunk, last_chunk, n_chunks)
    per document. ``token_col`` must be a non-negative token count;
    zero-token docs occupy no span (last_chunk = first_chunk, width 0
    handled as a 1-chunk placement at their start offset)."""
    base = df.select(F.col(key_col).alias("key"),
                     F.col(token_col).cast("long").alias("n_tokens"))
    bucketed = base.withColumn("_b", hash_bucket(F.col("key"), num_buckets))
    w_cum = (Window.partitionBy("_b").orderBy("key")
             .rowsBetween(Window.unboundedPreceding, -1))
    staged = bucketed.withColumn(
        "_cum", F.coalesce(F.sum("n_tokens").over(w_cum), F.lit(0)))
    # bucket token totals via a groupBy on the windowed output — it is
    # already partitioned by _b, so the aggregation adds no exchange
    # and the old second (unordered) count window over the data-sized
    # frame disappears (optimization round 12, guide §2.4; same shape
    # as graph_build.dense_ids_scalable)
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (staged.groupBy("_b").agg(F.sum("n_tokens").alias("_btot"))
               .select("_b",
                       F.coalesce(F.sum("_btot").over(w_off), F.lit(0))
                       .alias("_off")))
    b = F.lit(int(budget))
    start = (F.col("_off") + F.col("_cum")).alias("start_offset")
    return (staged.join(F.broadcast(offsets), "_b")
            .select("key", "n_tokens", start)
            .select(
                "key", "n_tokens", "start_offset",
                F.floor(F.col("start_offset") / b).alias("first_chunk"),
                F.floor((F.col("start_offset")
                         + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / b)
                .alias("last_chunk"))
            .withColumn("n_chunks",
                        (F.col("last_chunk") - F.col("first_chunk") + 1)
                        .cast("long")))


def chunk_fill(packed: DataFrame, budget: int) -> DataFrame:
    """(chunk, n_docs, n_tokens) per chunk — the packing-efficiency
    report (every chunk except the last is exactly ``budget`` full; the
    per-chunk doc count is what batch loaders need). Token attribution:
    a straddling doc contributes the overlap of its [start, start+n)
    span with the chunk's [c*B, (c+1)*B) window."""
    b = F.lit(int(budget))
    spans = packed.select(
        "key", "n_tokens", "start_offset",
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk"))
    lo = F.greatest(F.col("start_offset"), F.col("chunk") * b)
    hi = F.least(F.col("start_offset") + F.col("n_tokens"),
                 (F.col("chunk") + 1) * b)
    return (spans
            .withColumn("_overlap", F.greatest(hi - lo, F.lit(0)))
            .groupBy("chunk")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_overlap").alias("n_tokens")))
