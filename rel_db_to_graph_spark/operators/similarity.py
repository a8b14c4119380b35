"""Similarity search over an embedding column (array<float>, 64-dim in the
testdata).

Two paths, per the 100 TB playbook:

  * ``brute_force_topk`` — exact cosine top-k. The query vector is a
    one-row DataFrame crossJoin'd in (broadcast — it is literally one
    row), the dot product is a codegen'd fold (functions/vector.py), and
    the only wide operation is the final ``orderBy().limit(k)`` which
    Spark executes as a per-partition TakeOrdered + driver merge of k
    rows, NOT a total sort. Linear scan, embarrassingly parallel: the
    right baseline and the right recall=1.0 answer.
  * ``lsh_topk`` — sign-bit LSH bucketing: vectors are pre-bucketed by
    the signs of their first b dims, the query probes only its own
    bucket, so the scan touches ~1/2^b of the data. Recall < 1 by
    construction; bucket assignment is an equi-join key, so at scale the
    candidate fetch is a partition-pruned read, not a shuffle. (An IVF
    variant would replace sign buckets with k-means centroids — same
    join shape.)
  * ``embedding_near_dup_pairs`` — embedding-cosine near-dup detection:
    same-bucket equi-join generates candidate pairs (no cross join),
    exact cosine verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.functions.vector import cosine, sign_bucket, to_double
from rel_db_to_graph_spark.operators.semantic import (
    _GEMM_MIN_PAIRS,
    _MAX_GRID_CELLS,
    _TARGET_PAIRS_PER_CELL,
)


def _with_vec(embeddings: DataFrame, vec_col: str) -> DataFrame:
    return embeddings.withColumn("_v", to_double(F.col(vec_col)))


def _gemm_pair_fn(threshold: float):
    """Cogrouped-cell pair kernel for ``embedding_near_dup_pairs``: one
    grid cell's left/right rows → the (id_a, id_b, score) pairs at or
    above threshold. Same Arrow GEMM + HALF_UP 6-dp rounding as
    semantic.py's ``_gemm_cell_fn`` (round 10 reuse: this was the last
    per-pair scalar-cosine hot path — the ~1-2 M pairs/s/core binding
    constant the sf10 probes measured); unlike the semantic kernel it
    emits the surviving PAIRS with scores, not just dropped ids.
    Factory-wrapped so the closure pickles by value."""
    def fn(key, lpdf, rpdf):
        import numpy as np
        import pandas as pd
        if len(lpdf) == 0 or len(rpdf) == 0:
            # dtype-preserving empty frame (the id column keeps the
            # caller's id type — review r10: the kernel must not narrow
            # embedding_near_dup_pairs' generic id_col contract)
            return pd.DataFrame({"id_a": lpdf["_ida"].iloc[:0],
                                 "id_b": rpdf["_idb"].iloc[:0],
                                 "score": pd.Series([], dtype="float64")})
        a_ids = lpdf["_ida"].to_numpy()
        b_ids = rpdf["_idb"].to_numpy()
        a = np.stack(lpdf["_va"].to_numpy())     # (nL, d) float64
        b = np.stack(rpdf["_vb"].to_numpy())     # (nR, d) float64
        na = np.sqrt((a * a).sum(axis=1))
        nb = np.sqrt((b * b).sum(axis=1))
        raw = (a @ b.T) / (na[:, None] * nb[None, :])
        # HALF_UP 6-dp emulation (see semantic._gemm_cell_fn): the
        # int/1e6 quotient is the nearest double of the decimal, i.e.
        # the same double F.round/DuckDB round(,6) produce
        sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        mask = (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
        ii, jj = np.nonzero(mask)
        return pd.DataFrame({"id_a": a_ids[ii], "id_b": b_ids[jj],
                             "score": sims[ii, jj]})
    return fn


def brute_force_topk(embeddings: DataFrame, query_id: int, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbours of ``query_id`` (excluded itself).

    Returns (vec_id, score) — score rounded so results are hash-stable.
    """
    e = _with_vec(embeddings, vec_col)
    q = (e.filter(F.col(id_col) == query_id)
         .select(F.col("_v").alias("_q")))
    return (
        e.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col),
                F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def lsh_topk(embeddings: DataFrame, query_id: int, k: int = 10,
             n_bits: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the query's sign-bit bucket."""
    e = _with_vec(embeddings, vec_col).withColumn(
        "_bucket", sign_bucket(F.col("_v"), n_bits))
    q = (e.filter(F.col(id_col) == query_id)
         .select(F.col("_v").alias("_q"), F.col("_bucket")))
    return (
        e.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), "_bucket")
        .select(F.col(id_col),
                F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                             n_bits: int = 8, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             max_bucket: int | None = 1000,
                             gemm_min_pairs: int = _GEMM_MIN_PAIRS) -> DataFrame:
    """(id_a, id_b, score) same-bucket pairs with cosine ≥ threshold.

    ``max_bucket`` is the same 100 TB safety valve as
    ``dedup.lsh_candidate_pairs``: one degenerate sign bucket (e.g. many
    near-zero embeddings all hashing to bucket 0) otherwise produces
    m²/2 candidate pairs. Buckets larger than the cap are dropped, which
    bounds the join's worst-case fan-out at max_bucket² independent of
    the data. ON by default; pass None explicitly for exhaustive pairs.

    Round 10: the verify stage adopts semantic.py's full pair-work
    machinery — an adaptive per-bucket 2-D grid (salted equi-join cells
    sized to _TARGET_PAIRS_PER_CELL, AQE-exempt explicit partition
    count) with buckets at or above ``gemm_min_pairs`` pair rows
    evaluated by the Arrow GEMM cell kernel instead of per-pair scalar
    `F.aggregate(zip_with(...))` cosine. That scalar expression was the
    last known ~1-2 M pairs/s/core hot path (sf10 probe, round 8): a
    hot sign bucket at 100 TB (boilerplate embeddings) hits exactly the
    megacluster shape semantic_dedup already solved. Routing metadata
    is a broadcast-joined per-bucket frame (≤ 2^n_bits rows — driver-
    sized for the practical n_bits ≤ 16), never O(buckets) literal
    expressions. Both kernels share the HALF_UP 6-dp rounding rule, so
    results are bit-identical across routing (tests/test_extensions.py
    pins GEMM == scalar == mixed)."""
    # materialize the bucketed frame ONCE (review r10): every pair side
    # below re-reads it, and without the checkpoint the scan +
    # sign_bucket would run 4-6x per call (semantic_dedup checkpoints
    # its `assigned` for the same reason)
    e = _with_vec(embeddings, vec_col).withColumn(
        "_bucket", sign_bucket(F.col("_v"), n_bits)).localCheckpoint(
        eager=True)
    # ONE bucket-count aggregation serves both the max_bucket cap and
    # the grid sizing: capped buckets are dropped in the DRIVER dict,
    # so the inner route join below removes their rows — no second
    # aggregation, no bn join
    sizes = {r["_bucket"]: r["n"] for r in
             e.groupBy("_bucket").agg(F.count("*").alias("n")).collect()}
    if max_bucket is not None:
        sizes = {bk: m for bk, m in sizes.items() if m <= max_bucket}
    if not sizes:
        return (e.select(F.col(id_col).alias("id_a"),
                         F.col(id_col).alias("id_b"),
                         F.lit(0.0).alias("score")).limit(0))
    grid: dict[int, tuple[int, int]] = {}
    gemm_set: set[int] = set()
    for bk, m in sizes.items():
        cells = max(1, min(_MAX_GRID_CELLS,
                           -(-(m * m) // _TARGET_PAIRS_PER_CELL)))
        g_r = max(1, int(cells ** 0.5))
        grid[bk] = (-(-cells // g_r), g_r)
        if m * m >= gemm_min_pairs:
            gemm_set.add(bk)

    spark = embeddings.sparkSession
    route = F.broadcast(spark.createDataFrame(
        [(int(bk), int(g[0]), int(g[1]), bk in gemm_set)
         for bk, g in sorted(grid.items())],
        schema="_bucket int, _gl int, _gr int, _gemm boolean"))
    routed = e.join(route, "_bucket")
    left = (routed.select(F.col("_bucket"), F.col(id_col).alias("_ida"),
                          F.col("_v").alias("_va"), "_gl", "_gr", "_gemm")
            .withColumn("_bl", F.pmod(F.xxhash64("_ida"), F.col("_gl"))
                        .cast("int"))
            .withColumn("_br", F.explode(
                F.sequence(F.lit(0), F.col("_gr") - F.lit(1))))
            .drop("_gl", "_gr"))
    # work-based partition sizing (see semantic.py: cell count floors
    # at 1/bucket, so many small buckets would spin O(buckets) tasks)
    total_pairs = sum(m * m for m in sizes.values())
    n_part = int(max(spark.sparkContext.defaultParallelism,
                     min(-(-total_pairs // _TARGET_PAIRS_PER_CELL),
                         _MAX_GRID_CELLS * 4)))
    left = left.repartition(n_part, F.col("_bucket"), F.col("_bl"),
                            F.col("_br"))
    right = (routed.select(F.col("_bucket"), F.col(id_col).alias("_idb"),
                           F.col("_v").alias("_vb"), "_gl", "_gr", "_gemm")
             .withColumn("_br", F.pmod(F.xxhash64("_idb"), F.col("_gr"))
                         .cast("int"))
             .withColumn("_bl", F.explode(
                 F.sequence(F.lit(0), F.col("_gl") - F.lit(1))))
             .drop("_gl", "_gr"))
    in_gemm = F.col("_gemm")
    pairs = (
        left.filter(~in_gemm).drop("_gemm")
        .join(right.filter(~in_gemm).drop("_gemm"),
              ["_bucket", "_bl", "_br"])
        .filter(F.col("_ida") < F.col("_idb"))
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"),
                F.round(cosine(F.col("_va"), F.col("_vb")), 6)
                .alias("score"))
        .filter(F.col("score") >= threshold)
    )
    if gemm_set:
        # positional-renamed cogroup keys: both sides descend from one
        # routed frame; same-named keys trip the ambiguous-self-join
        # analyzer (semantic.py, round 10)
        r_gemm = (right.filter(in_gemm).drop("_gemm")
                  .withColumnsRenamed({"_bucket": "_bkb", "_bl": "_blb",
                                       "_br": "_brb"}))
        # output schema follows the caller's id type (review r10)
        id_t = embeddings.schema[id_col].dataType.simpleString()
        gemm_pairs = (
            left.filter(in_gemm).drop("_gemm")
            .groupBy("_bucket", "_bl", "_br")
            .cogroup(r_gemm.groupBy("_bkb", "_blb", "_brb"))
            .applyInPandas(_gemm_pair_fn(threshold),
                           schema=f"id_a {id_t}, id_b {id_t}, "
                                  "score double")
        )
        pairs = pairs.unionByName(gemm_pairs)
    return pairs


def filtered_topk(embeddings: DataFrame, query_id: int,
                  predicate, k: int = 10, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Filtered vector search: exact cosine top-k among rows satisfying
    ``predicate`` (a Column) — metadata-filtered ANN, the query shape
    every vector store serves ('nearest docs WHERE lang = de'). The
    predicate is applied BEFORE the distance computation, so it pushes
    to the scan and the top-k runs over the filtered subset only (pre-
    filtering — exact, unlike post-filtering a larger unfiltered k)."""
    e = _with_vec(embeddings, vec_col)
    q = (e.filter(F.col(id_col) == query_id)
         .select(F.col("_v").alias("_q")))
    return (
        e.filter((F.col(id_col) != query_id) & predicate)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col),
                F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def batch_topk(embeddings: DataFrame, query_ids: list[int], k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Batched multi-query ANN: top-k per query vector in ONE plan —
    the q query rows broadcast against a single corpus scan, ranked per
    query with a window. One pass over the data regardless of |q|
    (vs |q| sequential scans); the window's partition is the query id,
    so no global sort. Returns (query_id, vec_id, score, rnk)."""
    from pyspark.sql import Window

    e = _with_vec(embeddings, vec_col)
    qs = (e.filter(F.col(id_col).isin([int(i) for i in query_ids]))
          .select(F.col(id_col).alias("query_id"), F.col("_v").alias("_q")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        e.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col),
                F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def knn_classify(embeddings: DataFrame, query_ids: list[int], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """k-NN majority-vote classification over the embedding corpus:
    (query_id, true_label, pred_label, votes). Composes ``batch_topk``
    (one corpus scan for all queries) with a label join and a per-query
    vote argmax — ties break to the larger vote count then the SMALLER
    label, so the prediction is engine-order-independent. The workhorse
    for label densification / weak supervision over an embedded corpus;
    at scale the brute scan swaps for the IVF/PQ probes in ivf.py
    unchanged above the nn frame."""
    from pyspark.sql import Window

    nn = batch_topk(embeddings, query_ids, k, id_col, vec_col)
    lab = embeddings.select(F.col(id_col), F.col(label_col).alias("_lab"))
    votes = (nn.join(lab, id_col)
             .groupBy("query_id", "_lab")
             .agg(F.count("*").alias("votes")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.col("_lab").asc())
    best = (votes.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("query_id", F.col("_lab").alias("pred_label"), "votes"))
    truth = embeddings.select(F.col(id_col).alias("query_id"),
                              F.col(label_col).alias("true_label"))
    return (best.join(truth, "query_id")
            .select("query_id", "true_label", "pred_label", "votes"))
