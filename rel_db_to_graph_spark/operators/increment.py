"""Incremental (append-only) dense-id assignment — the CDC path for
graph maintenance at scale.

The reference rebuilds its dense-id dicts from scratch on every convert
run (convert_to_graph.py:27 — fine for a sample DB, impossible for a
100 TB graph where yesterday's node ids are baked into persisted edge
tables, checkpoints, and trained embeddings). The scalable contract is
APPEND-ONLY ids: existing (pk, node_id) rows are immutable; a batch of
new rows gets ids ``max_id+1 ..`` in the same deterministic bucketed
order ``dense_ids_scalable`` uses, so the union stays dense 0..N+K-1
and every previously-written artifact remains valid.

Plan shape (no driver state, no total sort):
  * new pks = one ANTI-join of the batch against the existing mapping
    (at scale: broadcast if the batch is small, shuffle-hash otherwise);
  * the base offset ``max(node_id)+1`` rides along as a BROADCAST
    SCALAR (1-row aggregate cross-joined in — the key_skew pattern),
    not a driver collect;
  * id assignment reuses the bucketed rank + prefix-sum-offset plan of
    ``dense_ids_scalable`` (one shuffle of the NEW pks only — the
    existing mapping is never re-shuffled, which is the entire point:
    incremental cost scales with the batch, not the graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.graph_build import (
    DEFAULT_ID_BUCKETS,
    dense_ids_scalable,
)


def dense_ids_append(existing: DataFrame, batch: DataFrame, pk: str,
                     num_buckets: int = DEFAULT_ID_BUCKETS) -> DataFrame:
    """Union mapping (pk, node_id): ``existing`` rows unchanged, pks of
    ``batch`` not yet mapped appended densely above max(node_id).
    Idempotent: re-appending an already-mapped batch is a no-op."""
    new_pks = (batch.select(F.col(pk).alias("pk")).distinct()
               .join(existing.select("pk"), "pk", "left_anti"))
    base = existing.agg(
        F.coalesce(F.max("node_id") + 1, F.lit(0)).alias("_base"))
    appended = (
        dense_ids_scalable(new_pks, "pk", num_buckets=num_buckets,
                           assume_unique=True)
        .crossJoin(F.broadcast(base))
        .select("pk", (F.col("node_id") + F.col("_base")).cast("long")
                .alias("node_id"))
    )
    return existing.select("pk", "node_id").unionAll(appended)
