"""Product quantization (PQ) — compressed-vector ANN, the memory-side
scale path for similarity search (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

IVF (operators/ivf.py) prunes WHICH vectors a query scans; PQ shrinks
WHAT each scanned vector costs: the d-dim float vector (4·d bytes) is
replaced by m subspace code bytes — a 64-dim float32 embedding (256 B)
becomes m=4 codes (4 B), a 64× compression, which is what lets a
100 TB embedding corpus live in executor memory as a code table.

Everything is deterministic and DataFrame-native:
  * training: per subspace s, Lloyd k-means over the slice
    ``vec[s·dsub : (s+1)·dsub]`` — init = the k lowest-id vectors'
    subvectors, assignment = argmin over k broadcast centroid literals
    (ties to the lower code), update = one groupBy(code) per-dimension
    mean. Codebooks are m·k·dsub doubles — KBs, driver-sized by
    construction;
  * encoding: map-only — m argmin expressions per row, emitting
    ``codes: array<int>``; no shuffle, no UDF;
  * query (ADC — asymmetric distance): the query stays EXACT; per
    subspace a k-entry lookup table of squared distances
    ``‖q_s − c_{s,j}‖²`` is folded into the plan as an array literal,
    and each row's estimated distance is m ``element_at`` lookups —
    whole-stage-codegen integer indexing over the code column, then
    one TakeOrdered(k). The corpus floats are never touched at query
    time.

Cross-engine determinism (DuckDB oracle): argmin ordering uses squared
distances that both engines accumulate in index order; ties break to
the lower code id; the output distance is rounded to 6 dp (queries.py
determinism rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
                       F.lit(0.0), lambda acc, x: acc + x)


def _sub(vec: Column, s: int, dsub: int) -> Column:
    return F.slice(vec, s * dsub + 1, dsub)


def _assign_code(vec: Column, s: int, dsub: int,
                 codebook: list[list[float]]) -> Column:
    """argmin code over the subspace codebook; ties -> lowest code."""
    dists = F.array(*[_sq_dist(_sub(vec, s, dsub), c) for c in codebook])
    return F.array_position(dists, F.array_min(dists)).cast("int") - 1


def _assign_sub(df: DataFrame, s: int, dsub: int,
                codebook: list[list[float]], out: str) -> DataFrame:
    return df.withColumn(
        out, _assign_code(F.col("_v"), s, dsub, codebook))


def train_pq(embeddings: DataFrame, m: int = 4, k: int = 8, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             _e: DataFrame | None = None) -> list[list[list[float]]]:
    """Per-subspace codebooks ``[m][k][dsub]``. Deterministic: init =
    the k lowest-id vectors' subvectors; ties in argmin break to the
    lower code. Raises if the dimension is not divisible by ``m``.

    ``_e`` (optimization round 12): an already-materialized
    ``(_id, _v double)`` frame to train on — composed callers (pq_topk,
    ivfpq_topk) share ONE cast+checkpoint of the corpus across
    training, encoding and the query-vector lookup instead of paying a
    scan + cast + barrier per phase. Values are identical (the cast is
    the same expression)."""
    if _e is not None:
        e = _e
    else:
        e = embeddings.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col),
                        lambda x: x.cast("double")).alias("_v"))
        e = e.localCheckpoint(eager=True)  # m·iters argmin passes re-read _v

    init = e.orderBy("_id").limit(k).collect()
    dim = len(init[0]["_v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    books: list[list[list[float]]] = [
        [list(r["_v"])[s * dsub:(s + 1) * dsub] for r in init]
        for s in range(m)
    ]
    # all m subspaces train in the SAME pass per Lloyd iteration: one
    # job computing every subspace's assignments and per-(subspace,
    # code, pos) means at once (m sequential small k-means would pay
    # m x iters job latencies for no reason — the fused pass is ~m x
    # faster wall-clock at any scale). Means rounded to 6 dp so the
    # codebooks are BIT-identical with the DuckDB twin (centroid values
    # flow into the output distance here, unlike ivf.py where they only
    # pick clusters).
    for _ in range(iters):
        cells = F.explode(F.array(*[
            F.struct(
                F.lit(s).alias("s"),
                _assign_code(F.col("_v"), s, dsub, books[s]).alias("c"),
                _sub(F.col("_v"), s, dsub).alias("sub"))
            for s in range(m)]))
        agg = (e.select(cells.alias("sc"))
               .select("sc.s", "sc.c", F.posexplode("sc.sub")
                       .alias("pos", "x"))
               .groupBy("s", "c", "pos")
               .agg(F.round(F.avg("x"), 6).alias("mu"))
               .collect())
        new: list[dict[int, dict[int, float]]] = [
            {j: {} for j in range(k)} for _ in range(m)]
        for r in agg:
            new[r.s][r.c][r.pos] = r.mu
        books = [
            [[new[s][j][p] for p in sorted(new[s][j])]
             if new[s][j] else books[s][j] for j in range(k)]
            for s in range(m)
        ]
    return books


def encode_pq(embeddings: DataFrame, books: list[list[list[float]]],
              id_col: str = "vec_id", vec_col: str = "embedding",
              _e: DataFrame | None = None) -> DataFrame:
    """(id[, extras], codes array<int> of length m) — the compressed
    corpus. Map-only; at scale this is the frame you persist instead of
    the float vectors. ``_e``: pre-cast ``(id_col, _v[, extras])``
    frame (see train_pq); any extra column (e.g. the coarse ``cluster``
    of an IVFPQ build) rides through the encoding, which lets composed
    callers skip a re-join on id."""
    m = len(books)
    dsub = len(books[0][0])
    if _e is not None:
        e = _e
    else:
        e = embeddings.select(
            F.col(id_col),
            F.transform(F.col(vec_col),
                        lambda x: x.cast("double")).alias("_v"))
    extras = [c for c in e.columns if c not in (id_col, "_v")]
    for s in range(m):
        e = _assign_sub(e, s, dsub, books[s], f"_c{s}")
    return e.select(
        F.col(id_col), *extras,
        F.array(*[F.col(f"_c{s}") for s in range(m)]).alias("codes"))


def adc_estimate(books: list[list[list[float]]], qv: list[float]) -> Column:
    """The ADC distance expression over a ``codes`` column: per-subspace
    LUT of ||q_s - c_{s,j}||^2 folded into the plan, summed by m
    element_at lookups (left-associated, index order — matches the
    oracle's explicit addition chain)."""
    m, dsub = len(books), len(books[0][0])
    est = F.lit(0.0)
    for s in range(m):
        qs = qv[s * dsub:(s + 1) * dsub]
        lut = [sum((a - b) * (a - b) for a, b in zip(qs, c))
               for c in books[s]]
        est = est + F.element_at(F.array(*[F.lit(float(x)) for x in lut]),
                                 F.element_at("codes", s + 1) + 1)
    return est


def pq_topk(embeddings: DataFrame, query_id: int, k: int = 10,
            m: int = 4, n_codes: int = 8, iters: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k by ASCENDING estimated squared distance (ADC), ties to the
    lower id. Returns (id, adist rounded to 6 dp)."""
    # one cast + one barrier shared by training, encoding and the
    # query-vector lookup (optimization round 12 — was a scan + cast
    # per phase)
    base = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v")
    ).localCheckpoint(eager=True)
    books = train_pq(embeddings, m=m, k=n_codes, iters=iters,
                     _e=base.select(F.col(id_col).alias("_id"), "_v"))
    codes = encode_pq(embeddings, books, id_col=id_col, _e=base)
    dsub = len(books[0][0])

    qv = list(base.filter(F.col(id_col) == query_id)
              .collect()[0]["_v"])
    assert dsub * m == len(qv)
    return (
        codes.filter(F.col(id_col) != query_id)
        .select(F.col(id_col),
                F.round(adc_estimate(books, qv), 6).alias("adist"))
        .orderBy("adist", id_col)
        .limit(k)
    )


def ivfpq_topk(embeddings: DataFrame, query_id: int, k: int = 10,
               n_clusters: int = 8, nprobe: int = 4, m: int = 4,
               n_codes: int = 8, iters: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF + PQ composed — the FAISS-style shape for web-scale vector
    search: the coarse quantizer (operators/ivf.py k-means) prunes WHICH
    rows are scanned (nprobe/n_clusters of the corpus; partition-pruned
    when the index is written partitionBy(cluster)), and PQ codes shrink
    WHAT each scanned row costs (m bytes, ADC lookups). Raw-vector PQ
    (no residual encoding) so the codebooks are shared with ``pq_topk``
    and the whole composition stays oracle-checkable."""
    from rel_db_to_graph_spark.operators.ivf import build_ivf_index

    # eagerly checkpointed by the build in both k-regimes (ADVICE r10)
    assigned, centroids = build_ivf_index(embeddings, k=n_clusters,
                                          iters=iters, id_col=id_col,
                                          vec_col=vec_col)
    # PQ training/encoding reuse the IVF build's checkpointed (id, _v)
    # frame — same cast, so the codebooks are identical; saves a second
    # corpus scan + cast + barrier (optimization round 12)
    books = train_pq(embeddings, m=m, k=n_codes, iters=iters,
                     _e=assigned.select(F.col(id_col).alias("_id"), "_v"))
    codes = encode_pq(embeddings, books, id_col=id_col,
                      _e=assigned.select(id_col, "_v"))

    qv = list(assigned.filter(F.col(id_col) == query_id)
              .collect()[0]["_v"])
    from rel_db_to_graph_spark.operators.ivf import nearest_centroid_ids
    probe = nearest_centroid_ids(list(enumerate(centroids)), qv, nprobe)
    return (
        codes.join(assigned.select(id_col, "cluster"), id_col)
        .filter(F.col("cluster").isin(probe))
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col),
                F.round(adc_estimate(books, qv), 6).alias("adist"))
        .orderBy("adist", id_col)
        .limit(k)
    )


def write_ivfpq_index(embeddings: DataFrame, path: str,
                      n_clusters: int = 8, m: int = 4, n_codes: int = 8,
                      iters: int = 2, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      partition_buckets: int | None = None,
                      ) -> list[list[list[float]]]:
    """Materialize the IVFPQ index as it would ship at 100 TB: PQ CODES
    (m small ints per vector — the 64x-compressed corpus) parquet-
    partitioned BY COARSE CLUSTER, plus driver-sized sidecars (coarse
    centroids + PQ codebooks as json). A probe then reads only
    nprobe/n_clusters of an already-64x-smaller dataset — directory
    pruning times code compression. Returns the codebooks.

    ``partition_buckets``: same large-k layout escape as
    ivf.write_ivf_index — directories keyed by cluster % buckets with
    a per-file cluster sort (row-group pruning carries the exact
    predicate), because one directory per cluster stops being a layout
    and starts being a metastore attack around k≈100k."""
    from rel_db_to_graph_spark.operators.ivf import build_ivf_index

    assigned, centroids = build_ivf_index(embeddings, k=n_clusters,
                                          iters=iters, id_col=id_col,
                                          vec_col=vec_col)
    # PQ training/encoding reuse the IVF build's checkpointed (id, _v)
    # frame (identical cast → identical codebooks); the cluster column
    # rides along through encoding, so the old codes⋈assigned re-join
    # on id disappears as well (optimization round 12, guide §2.4)
    books = train_pq(embeddings, m=m, k=n_codes, iters=iters,
                     _e=assigned.select(F.col(id_col).alias("_id"), "_v"))
    codes = encode_pq(embeddings, books, id_col=id_col,
                      _e=assigned.select(id_col, "_v", "cluster"))
    from rel_db_to_graph_spark.operators.ivf import write_index_partitioned
    coded = codes
    write_index_partitioned(coded, path, "codes", partition_buckets)
    spark = embeddings.sparkSession
    (spark.createDataFrame([(i, c) for i, c in enumerate(centroids)],
                           "cluster int, cv array<double>")
     .coalesce(1).write.mode("overwrite").json(f"{path}/centroids"))
    (spark.createDataFrame(
        [(s, j, books[s][j]) for s in range(m) for j in range(n_codes)],
        "s int, code int, cv array<double>")
     .coalesce(1).write.mode("overwrite").json(f"{path}/codebooks"))
    return books


def ivfpq_topk_from_index(spark, path: str, query_vec: list[float],
                          k: int = 10, nprobe: int = 4,
                          id_col: str = "vec_id") -> DataFrame:
    """Probe a written IVFPQ index with an arbitrary query vector: pick
    the nprobe nearest coarse centroids from the sidecar (driver-sized),
    then ADC top-k over ONLY those clusters' code rows — the
    ``cluster IN (...)`` predicate prunes parquet directories (pinned
    by tests/test_plans.py) and the scan touches codes, never floats."""
    qv = [float(x) for x in query_vec]
    cents = {int(r.cluster): list(r.cv)
             for r in spark.read.json(f"{path}/centroids").collect()}
    brows = spark.read.json(f"{path}/codebooks").collect()
    m = max(r.s for r in brows) + 1
    n_codes = max(r.code for r in brows) + 1
    books = [[None] * n_codes for _ in range(m)]
    for r in brows:
        books[r.s][r.code] = list(r.cv)

    from rel_db_to_graph_spark.operators.ivf import (
        apply_index_bucket_pruning, nearest_centroid_ids,
        read_index_layout)
    probe = nearest_centroid_ids(sorted(cents.items()), qv, nprobe)
    nb = read_index_layout(spark, path, "codes")
    codes = apply_index_bucket_pruning(
        spark.read.parquet(f"{path}/codes"), nb, probe)
    return (codes.filter(F.col("cluster").isin(probe))
            .select(F.col(id_col),
                    F.round(adc_estimate(books, qv), 6).alias("adist"))
            .orderBy("adist", id_col)
            .limit(k))


def ivfpq_append(codes: DataFrame, assigned: DataFrame,
                 books: list[list[list[float]]],
                 centroids: list[list[float]],
                 new_vectors: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """Assign-only IVFPQ index maintenance (round 12 — the PQ-family
    sibling of operators/ivf.py::ivf_append): place ``new_vectors``
    into an existing IVFPQ index with BOTH quantizers FROZEN — the
    coarse centroids give each appended row its cluster (one argmin
    pass over only the new rows, via ivf_append) and the codebooks
    give it its m-byte code (encode_pq, map-only) — and return the
    unioned (codes, assignment) pair.

    This completes the daily-ingest story for both written index
    families: absorbing an append batch costs
    O(|batch|·(k_coarse + m·k_codes)·d) map work instead of the
    O(iters·n·…) rebuild, and neither the existing codes nor the
    existing assignment are re-shuffled. Quantizer drift accumulates
    exactly as in the IVF case — pair with a periodic retrain
    (build_ivf_index(train_sample=...) + train_pq), the FAISS-style
    add/retrain split. Codes and cluster placements of appended rows
    are bit-identical to what a frozen-quantizer rebuild would give
    them (pinned by tests/test_pq.py)."""
    from rel_db_to_graph_spark.operators.ivf import ivf_append

    all_assigned = ivf_append(assigned, centroids, new_vectors,
                              id_col=id_col, vec_col=vec_col)
    new_codes = encode_pq(new_vectors, books, id_col=id_col,
                          vec_col=vec_col)
    return codes.unionByName(new_codes), all_assigned
