"""Streaming embedding ingest into a frozen-quantizer vector index.

The continuous version of the round-12 assign-only maintenance
(operators/ivf.py::ivf_append): a Structured Streaming feed of new
embedding batches drains through ``foreachBatch``, each micro-batch is
placed into the existing coarse partition with the centroids FROZEN
(one argmin map pass over only that batch), and the accumulated
assignment is immediately probe-ready. Because the frozen placement is
a deterministic per-row map, the accumulated result is
BATCHING-INVARIANT — identical to a one-shot ``ivf_append`` of the
whole slice regardless of how the stream chops it (pinned by
tests/test_ivf.py; the `ivf_append_stream` tag of `ann_index_variants`
hash-checks it against the same DuckDB twin as the batch tag).

At 100 TB this is the ingest half of the FAISS-style add/retrain
split: embeddings arrive continuously (the CDC analog for the vector
tier), placement cost is O(|micro-batch|·k·d) map work per trigger,
and the periodic sampled retrain (build_ivf_index(train_sample=...))
owns drift — the same contract as the batch path, now under a
streaming source with checkpointable progress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class StreamingIndexAppender:
    """``foreachBatch`` sink: assign-only placement of each embedding
    micro-batch against frozen centroids, accumulated eagerly (the
    micro-batch frame is only valid inside its trigger, so every apply
    materializes via localCheckpoint before returning)."""

    def __init__(self, assigned: DataFrame, centroids: list[list[float]],
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self._acc = assigned
        self._cents = centroids
        self._id = id_col
        self._vec = vec_col

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        from rel_db_to_graph_spark.operators.ivf import ivf_append

        if not batch_df.isEmpty():
            self._acc = ivf_append(
                self._acc, self._cents, batch_df,
                id_col=self._id, vec_col=self._vec,
            ).localCheckpoint(eager=True)

    @property
    def assignment(self) -> DataFrame:
        """The accumulated (id, _v, cluster) frame — probe-ready."""
        return self._acc
