"""Semantic deduplication (SemDeDup-style): k-means cluster the
embedding space, then prune near-duplicate documents WITHIN each
cluster — the scalable recipe from Abbas et al., "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"
(arXiv:2303.09540). Exact/MinHash dedup (operators/dedup.py) catches
copies of the same BYTES; this tier catches paraphrases and template
re-renders that share no n-grams but sit on top of each other in
embedding space.

Spark-first shape (the reason this survives 100 TB):
  * clustering reuses the deterministic Lloyd k-means from
    operators/ivf.py — assignment is an argmin over k broadcast
    centroid literals (map-only), the update is one groupBy(cluster);
  * the candidate-pair join is an EQUI-join on cluster id — Catalyst
    hash-partitions it; there is no all-pairs cross join anywhere.
    With k sized so clusters hold ~10-50k docs (the published recipe
    uses k≈100k clusters for web scale), per-cluster pair work is
    bounded and embarrassingly parallel;
  * ``max_cluster`` caps the pair fan-out per cluster as a safety
    valve (same contract as dedup.py's ``max_bucket``): a runaway
    cluster contributes at most max_cluster^2/2 pairs. Oracle-gated
    callers pass ``None`` so parity stays data-independent.

Survivor rule (deterministic variant of the paper's "keep one per
near-dup group"): a document is DROPPED iff some LOWER-id document in
the same cluster has cosine similarity >= threshold. Lowest id always
survives; the rule needs no iteration, no transitive closure, and one
self-join — at the cost of occasionally keeping a doc whose only
above-threshold neighbour was itself dropped (documented, matched by
the oracle twin exactly).

Cosines are rounded to 6 dp BEFORE the threshold compare so the
Spark/DuckDB decision boundary is bit-identical (queries.py
determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.functions.vector import cosine
from rel_db_to_graph_spark.operators.ivf import build_ivf_index


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.2,
                   n_clusters: int = 8, iters: int = 3,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cluster: int | None = 2000,
                   salt: int = 16) -> DataFrame:
    """(vec_id, cluster, kept) for every input vector.

    ``kept`` is false iff a lower-id vector in the same k-means cluster
    has round(cosine, 6) >= threshold. ``max_cluster`` (production
    safety valve) considers only the ``max_cluster`` lowest-id vectors
    of a cluster as DROP CANDIDATES' comparison partners; pass ``None``
    for exhaustive within-cluster pairs (the oracle-checked mode).

    ``salt`` fixes the pair join's PARALLELISM cliff: a plain equi-join
    on cluster id has only n_clusters distinct keys, so with few or
    skewed clusters ALL pair work lands on n_clusters partitions no
    matter how many cores exist (measured ~50x wall-clock at sf1). The
    right side is bucketed by a deterministic id hash into ``salt``
    sub-keys and the left side replicated across all of them — every
    pair still meets exactly once, results are bit-identical, and the
    join fans out over n_clusters*salt partitions. Replication cost:
    salt copies of the (capped) left comparison set.
    """
    assigned, _ = build_ivf_index(embeddings, k=n_clusters, iters=iters,
                                  id_col=id_col, vec_col=vec_col)
    assigned = assigned.localCheckpoint(eager=True)

    left = assigned.select(F.col(id_col).alias("_ida"), "cluster",
                           F.col("_v").alias("_va"))
    if max_cluster is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("cluster").orderBy("_ida")
        left = (left.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= max_cluster).drop("_rk"))
    # Replicate left over the salt buckets, then FORCE a shuffle on the
    # (cluster, salt) key: without it, a single-file source (one input
    # partition) plus a broadcast-joined right side executes the whole
    # pair compare on ONE core — the salt keys exist but nothing
    # redistributes the rows (measured: the repartition, not the salt
    # alone, is what buys the ~n_cores speedup).
    left = (left.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1))))
        .repartition(F.col("cluster"), F.col("_salt")))
    right = assigned.select(
        F.col(id_col).alias("_idb"), "cluster",
        F.col("_v").alias("_vb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(salt)))
        .cast("int").alias("_salt"))
    dropped = (
        left.join(right, ["cluster", "_salt"])
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(F.round(cosine(F.col("_va"), F.col("_vb")), 6)
                >= F.lit(threshold))
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)),
                      id_col, "left")
        .select(F.col(id_col), "cluster",
                F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"))
    )


def semantic_survivors(embeddings: DataFrame, threshold: float = 0.2,
                       n_clusters: int = 8, iters: int = 3,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       max_cluster: int | None = 2000,
                       salt: int = 16) -> DataFrame:
    """Just the surviving ids — the frame a pipeline semi-joins the
    document table against."""
    flags = semantic_dedup(embeddings, threshold, n_clusters, iters,
                           id_col, vec_col, max_cluster, salt)
    return flags.filter(F.col("kept")).select(id_col, "cluster")
