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

#: adaptive pair-grid sizing (see semantic_dedup): target pair rows per
#: grid cell — small enough that an AQE-merged handful of cells is
#: still a sub-second task, large enough that replication stays ~√cells
_TARGET_PAIRS_PER_CELL = 2_000_000
#: per-cluster grid-cell cap: bounds left+right replication (each side
#: replicates ~√cells ≤ 64 copies) even for a pathological megacluster
_MAX_GRID_CELLS = 4096
#: clusters whose pair count reaches this route through the Arrow GEMM
#: kernel instead of the scalar pair join (see semantic_dedup): per-pair
#: scalar `F.aggregate(zip_with(...))` cosine tops out at ~1-2 M
#: pairs/s/core (the round-8 sf10 binding constant), while a numpy
#: float64 GEMM over the same cell does 10-100x that — the default
#: keeps sub-million-pair clusters on the cheap-to-launch scalar join
_GEMM_MIN_PAIRS = 1_000_000


def _gemm_cell_fn(threshold: float):
    """Cogrouped-cell pair kernel: one grid cell's left/right rows →
    the right-side ids dropped by that cell. Defined via a factory so
    the closure pickles BY VALUE (workers don't have the repo on
    sys.path when the driver imports __spark_entry__ by file path)."""
    def fn(key, lpdf, rpdf):
        import numpy as np
        import pandas as pd
        if len(lpdf) == 0 or len(rpdf) == 0:
            # dtype-preserving empty frame: the id column keeps the
            # caller's id type (review r10 — don't narrow the generic
            # id_col contract to int64)
            return pd.DataFrame({"_idb": rpdf["_idb"].iloc[:0]})
        a_ids = lpdf["_ida"].to_numpy()
        b_ids = rpdf["_idb"].to_numpy()
        a = np.stack(lpdf["_va"].to_numpy())     # (nL, d) float64
        b = np.stack(rpdf["_vb"].to_numpy())     # (nR, d) float64
        # norms ONCE per side, then one BLAS GEMM for all pair dots —
        # same dot/(|a|·|b|) formula shape as the scalar path, so the
        # only divergence is GEMM's blocked sum order vs the fold's
        # sequential order (last-ulp — the existing 6-dp-round-before-
        # compare convention absorbs exactly that class). Rounding
        # emulates the JVM/DuckDB HALF_UP tie rule (sign·floor(|x|·1e6
        # + 0.5)/1e6) rather than np.round's half-even, so all three
        # engines share ONE rounding rule; the residual divergence
        # class is only the scale-by-1e6 double ulp (~1e-11 per pair,
        # deterministic for fixed inputs — the oracle-gated query
        # cannot flake). tests/test_semantic.py pins GEMM == scalar on
        # real data and the DuckDB oracle re-checks the survivors.
        na = np.sqrt((a * a).sum(axis=1))
        nb = np.sqrt((b * b).sum(axis=1))
        raw = (a @ b.T) / (na[:, None] * nb[None, :])
        sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        mask = (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
        hit = np.unique(b_ids[mask.any(axis=0)])
        return pd.DataFrame({"_idb": hit})
    return fn


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.2,
                   n_clusters: int = 8, iters: int = 3,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cluster: int | None = 2000,
                   salt: int = 16,
                   gemm_min_pairs: int = _GEMM_MIN_PAIRS,
                   kmeans_sample: int | None = None,
                   kmeans_sample_seed: int = 42,
                   corpus_n: int | None = None) -> DataFrame:
    """(vec_id, cluster, kept) for every input vector.

    ``kept`` is false iff a lower-id vector in the same k-means cluster
    has round(cosine, 6) >= threshold. ``max_cluster`` (production
    safety valve) considers only the ``max_cluster`` lowest-id vectors
    of a cluster as DROP CANDIDATES' comparison partners; pass ``None``
    for exhaustive within-cluster pairs (the oracle-checked mode).

    ``salt`` fixes the pair join's PARALLELISM cliff: a plain equi-join
    on cluster id has only n_clusters distinct keys, so with few or
    skewed clusters ALL pair work lands on n_clusters partitions no
    matter how many cores exist (measured ~50x wall-clock at sf1).

    Since round 8 the salting is an ADAPTIVE 2-D GRID sized per
    cluster, because the sf10 probe caught the fixed 1×salt scheme
    regressing to a 2-core straggler on megaclusters: a cluster of
    ~100k near-identical vectors (boilerplate at web scale; verbatim
    replicas in the derived probe set) carries |left_c|·|c| pair work,
    the fixed 16 sub-keys left that work on 16 byte-small partitions,
    and AQE's byte-based coalescing — which cannot see a narrow row's
    quadratic compute multiplier — merged them further (observed:
    2 tasks owning ~5e9 cosine rows, 40+ min, in BOTH the capped and
    exhaustive modes). Per cluster c the grid is gL_c×gR_c cells with
    gL_c·gR_c ≈ pairs_c / _TARGET_PAIRS_PER_CELL (floored by ``salt``,
    capped by _MAX_GRID_CELLS): left rows hash into gL_c row-buckets
    and replicate across the gR_c column-buckets, right rows hash into
    gR_c column-buckets and replicate across the gL_c row-buckets, and
    the join keys on (cluster, rowb, colb) — every pair still meets
    EXACTLY once ((rowb(a), colb(b)) is unique), results are
    bit-identical, replication cost is ~sqrt(cells) per side instead
    of the 1-D scheme's cells-per-left-row. Cluster sizes come from one
    n_clusters-row driver collect; the final repartition pins an
    EXPLICIT partition count (user-specified numPartitions are exempt
    from AQE coalescing, which is what kept un-merging the grid).

    Since round 9 clusters whose pair count reaches ``gemm_min_pairs``
    evaluate their grid cells as an Arrow cogroup GEMM
    (``applyInPandas`` over the SAME (cluster, rowb, colb) grid: stack
    the cell's sides, one float64 ``A @ B.T``, round 6 dp, threshold,
    emit dropped ids) instead of the scalar pair join — the round-8
    grid fixed the DISTRIBUTION of megacluster work but left per-pair
    throughput at the ~1-2 M pairs/s/core of JVM expression eval,
    which was the sf10 binding constant; the GEMM kernel is 10-100x
    that at identical survivor semantics. Small clusters keep the
    scalar join (cheaper to launch, exercised side by side — both
    paths run inside the oracle-gated registry query).
    """
    # the build returns an eagerly-checkpointed frame in both k-regimes
    # (ADVICE r10) — safe to consume repeatedly below, never re-pin.
    # ``kmeans_sample`` is the advertised web-scale recipe's n-axis:
    # Lloyd trains on a content-addressed sample, the full corpus is
    # assigned in one GEMM map pass (round 11; no-op at small k)
    # seed + known-n are plumbed through so callers can vary the
    # content-addressed sample draw and skip the corpus count when the
    # size is already known (ADVICE r11)
    assigned, _ = build_ivf_index(embeddings, k=n_clusters, iters=iters,
                                  id_col=id_col, vec_col=vec_col,
                                  train_sample=kmeans_sample,
                                  seed=kmeans_sample_seed,
                                  corpus_n=corpus_n)

    # per-cluster grid dimensions from one tiny (n_clusters-row) collect
    sizes = {r["cluster"]: r["n"] for r in
             assigned.groupBy("cluster").agg(F.count("*").alias("n"))
             .collect()}
    if not sizes:      # empty input: nothing to compare, keep nothing
        return assigned.select(F.col(id_col), "cluster",
                               F.lit(True).alias("kept"))
    grid: dict[int, tuple[int, int]] = {}
    gemm_clusters: list[int] = []
    for c, n in sizes.items():
        n_left = n if max_cluster is None else min(n, max_cluster)
        cells = max(int(salt),
                    min(_MAX_GRID_CELLS,
                        -(-(n_left * n) // _TARGET_PAIRS_PER_CELL)))
        g_r = max(1, int(cells ** 0.5))
        g_l = -(-cells // g_r)
        grid[c] = (g_l, g_r)
        if n_left * n >= gemm_min_pairs:
            gemm_clusters.append(c)

    # Routing metadata travels as a BROADCAST-JOINED n_clusters-row
    # frame, not literal expressions: the previous nested-`when` chain /
    # `isin` literal list were O(n_clusters) Catalyst expression trees —
    # free at k=8, a plan-size/recursion bomb at the module's advertised
    # web-scale k≈100k. A broadcast hash join on cluster id costs one
    # tiny exchange regardless of k and produces identical values
    # (tests/test_semantic.py pins the survivor set at n_clusters≈2000).
    gemm_set = set(gemm_clusters)
    spark = embeddings.sparkSession
    route = F.broadcast(spark.createDataFrame(
        [(int(c), int(g[0]), int(g[1]), c in gemm_set)
         for c, g in sorted(grid.items())],
        schema="cluster int, _gl int, _gr int, _gemm boolean"))
    # ONE broadcast join onto the checkpointed assignment; both pair
    # sides then derive from this single routed frame (separate
    # per-side route joins trip the ambiguous-self-join analyzer at
    # the cogroup)
    routed = assigned.join(route, "cluster")

    # left: fixed row-bucket, replicated across the column-buckets;
    # the explicit-numPartitions repartition both spreads the work and
    # opts the exchange out of AQE coalescing
    left = routed.select(F.col(id_col).alias("_ida"), "cluster",
                         F.col("_v").alias("_va"), "_gl", "_gr", "_gemm")
    if max_cluster is not None:
        # per-cluster id cap computed on a NARROW (cluster, id) frame,
        # then broadcast back: ranking the wide frame directly made a
        # boilerplate megacluster a single-task window sort of rows
        # CARRYING the d-dim vector (d× the shuffle/sort bytes for the
        # straggler task). The cap — the max_cluster-th smallest id, or
        # the cluster max when it is small — selects exactly the same
        # rows (ids are unique), the narrow sort moves ~16 bytes/row,
        # and the wide frame only pays a broadcast hash join. The
        # oracle-gated mode (max_cluster=None) never enters here.
        from pyspark.sql import Window
        w = Window.partitionBy("cluster").orderBy("_ida")
        caps = F.broadcast(
            left.select("cluster", "_ida")
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_cluster)
            .groupBy("cluster").agg(F.max("_ida").alias("_cap")))
        left = (left.join(caps, "cluster")
                .filter(F.col("_ida") <= F.col("_cap")).drop("_cap"))
    left = (left
            .withColumn("_bl", F.pmod(F.xxhash64("_ida"), F.col("_gl"))
                        .cast("int"))
            .withColumn("_br", F.explode(
                F.sequence(F.lit(0), F.col("_gr") - F.lit(1))))
            .drop("_gl", "_gr"))
    # partition count sized by total pair WORK, not cell count: the
    # per-cluster grid floors at `salt` cells, so at large n_clusters
    # cell count is O(k) regardless of work — sizing on it spun 16k
    # AQE-exempt tasks for ~100-pair clusters (measured: k=20k at sf10
    # spent minutes on task floor). Work-based sizing keeps the
    # megacluster protection (pairs/TARGET explodes exactly when the
    # r8 straggler case does) without the small-cluster task storm.
    total_pairs = sum((n if max_cluster is None else min(n, max_cluster))
                      * n for n in sizes.values())
    n_part = int(max(spark.sparkContext.defaultParallelism,
                     min(-(-total_pairs // _TARGET_PAIRS_PER_CELL),
                         _MAX_GRID_CELLS * 4)))
    left = left.repartition(n_part, F.col("cluster"), F.col("_bl"),
                            F.col("_br"))
    right = (routed.select(
        F.col(id_col).alias("_idb"), "cluster", F.col("_v").alias("_vb"),
        "_gl", "_gr", "_gemm")
        .withColumn("_br", F.pmod(F.xxhash64("_idb"), F.col("_gr"))
                    .cast("int"))
        .withColumn("_bl", F.explode(
            F.sequence(F.lit(0), F.col("_gl") - F.lit(1))))
        .drop("_gl", "_gr"))
    in_gemm = F.col("_gemm")
    dropped = (
        left.filter(~in_gemm).drop("_gemm")
        .join(right.filter(~in_gemm).drop("_gemm"),
              ["cluster", "_bl", "_br"])
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(F.round(cosine(F.col("_va"), F.col("_vb")), 6)
                >= F.lit(threshold))
        .select(F.col("_idb").alias(id_col))
    )
    if gemm_clusters:
        # cogroup keys match POSITIONALLY, so the right side's keys are
        # renamed to fresh attributes — both sides descend from the one
        # routed frame and identically-named keys trip Spark's
        # ambiguous-self-join analyzer (the using-join form the scalar
        # path takes disambiguates; cogroup has no such form)
        r_gemm = (right.filter(in_gemm).drop("_gemm")
                  .withColumnsRenamed({"cluster": "_clb", "_bl": "_blb",
                                       "_br": "_brb"}))
        gemm_dropped = (
            left.filter(in_gemm).drop("_gemm")
            .groupBy("cluster", "_bl", "_br")
            .cogroup(r_gemm.groupBy("_clb", "_blb", "_brb"))
            .applyInPandas(
                _gemm_cell_fn(threshold),
                schema="_idb "
                + embeddings.schema[id_col].dataType.simpleString())
            .select(F.col("_idb").alias(id_col))
        )
        dropped = dropped.unionByName(gemm_dropped)
    dropped = dropped.distinct()
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
                       salt: int = 16,
                       gemm_min_pairs: int = _GEMM_MIN_PAIRS) -> DataFrame:
    """Just the surviving ids — the frame a pipeline semi-joins the
    document table against."""
    flags = semantic_dedup(embeddings, threshold, n_clusters, iters,
                           id_col, vec_col, max_cluster, salt,
                           gemm_min_pairs)
    return flags.filter(F.col("kept")).select(id_col, "cluster")
