"""IVF ANN: determinism, recall against the exact baseline, index shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.ivf import build_ivf_index, ivf_topk
from rel_db_to_graph_spark.operators.similarity import brute_force_topk
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_index_partitions_all_vectors(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    assigned, centroids = build_ivf_index(emb, k=8, iters=2)
    assert assigned.count() == emb.count()
    assert len(centroids) == 8
    assert assigned.filter((F.col("cluster") < 0) | (F.col("cluster") >= 8)).count() == 0


def test_ivf_deterministic(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = ivf_topk(emb, query_id=0, k=5, n_clusters=8, nprobe=2).collect()
    b = ivf_topk(emb, query_id=0, k=5, n_clusters=8, nprobe=2).collect()
    assert [(r.vec_id, r.score) for r in a] == [(r.vec_id, r.score) for r in b]


def test_ivf_recall_reasonable(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {r.vec_id for r in brute_force_topk(emb, query_id=0, k=10).collect()}
    # full probe == exact scan (recall 1.0 when nprobe = n_clusters)
    full = {r.vec_id for r in
            ivf_topk(emb, query_id=0, k=10, n_clusters=8, nprobe=8).collect()}
    assert full == exact
    # partial probe still finds a decent share on random data
    part = {r.vec_id for r in
            ivf_topk(emb, query_id=0, k=10, n_clusters=8, nprobe=4).collect()}
    assert len(part & exact) >= 3


def test_compact_lloyd_update_matches_row_form(spark):
    """Round 10: the large-k Lloyd update (one array row per cluster —
    k rows cross the driver, not k·d) must produce bit-identical means
    to the row-per-dimension form it replaces: the second groupBy only
    reshapes already-computed doubles, so equality is exact, not
    approximate."""
    import numpy as np

    from rel_db_to_graph_spark.functions.vector import to_double
    from rel_db_to_graph_spark.operators import ivf

    emb = load_table(spark, SF_SMOKE, "embeddings")
    e = (emb.select(F.col("vec_id"),
                    to_double(F.col("embedding")).alias("_v"))
         .localCheckpoint(eager=True))
    init = [list(r["_v"]) for r in e.orderBy("vec_id").limit(8).collect()]
    assigned = ivf._assign(e, init).localCheckpoint(eager=True)

    # row form (the small-k path, inlined from build_ivf_index)
    agg = (assigned.select("cluster", F.posexplode("_v").alias("pos", "x"))
           .groupBy("cluster", "pos").agg(F.avg("x").alias("m"))
           .collect())
    new = {c: dict() for c in range(len(init))}
    for r in agg:
        new[r.cluster][r.pos] = r.m
    row_form = [[new[c][p] for p in sorted(new[c])] if new[c] else init[c]
                for c in range(len(init))]

    compact = ivf._lloyd_update_compact(
        assigned, np.asarray(init, dtype="float64"))
    assert compact.tolist() == row_form


def test_nearest_centroid_ids_numpy_matches_python(monkeypatch):
    """Round 10: the vectorized probe (k >= _GEMM_ASSIGN_MIN_K) must
    rank centroids exactly like the python fold, including the
    duplicate-centroid tie -> lower id rule."""
    from rel_db_to_graph_spark.operators import ivf

    items = [(i, [float(i % 5), float((i * 7) % 3), 0.25 * i])
             for i in range(40)]
    items.append((40, list(items[3][1])))      # exact tie with id 3
    qv = items[3][1]
    py = ivf.nearest_centroid_ids(items, qv, 6)
    monkeypatch.setattr(ivf, "_GEMM_ASSIGN_MIN_K", 1)
    np_ids = ivf.nearest_centroid_ids(items, qv, 6)
    assert py == np_ids
    assert py[0] == 3                          # tie broke toward 3, not 40


def test_gemm_assign_matches_literal(spark, monkeypatch):
    """Round 10: the Arrow GEMM assignment kernel (the k>=128 path that
    makes web-scale k compilable) must produce the SAME cluster ids as
    the literal zip_with-fold argmin on real data — including the
    identical-centroid tie case, which both kernels break toward the
    lowest cluster id."""
    from pyspark.sql import functions as F

    from rel_db_to_graph_spark.functions.vector import to_double
    from rel_db_to_graph_spark.operators import ivf

    emb = load_table(spark, SF_SMOKE, "embeddings")
    e = emb.select(F.col("vec_id"),
                   to_double(F.col("embedding")).alias("_v"))
    init = [list(r["_v"]) for r in e.orderBy("vec_id").limit(8).collect()]
    # duplicate a centroid: every vector is now equidistant to clusters
    # 3 and 8 -> the tie rule itself is under test
    init = init + [list(init[3])]
    lit = sorted((r.vec_id, r.cluster)
                 for r in ivf._assign(e, init).collect())
    monkeypatch.setattr(ivf, "_GEMM_ASSIGN_MIN_K", 1)
    gemm = sorted((r.vec_id, r.cluster)
                  for r in ivf._assign(e, init).collect())
    assert lit == gemm


def test_sampled_centroid_training_matches_full_partition(spark, monkeypatch):
    """Round 11 (the n-axis of the web-scale recipe): Lloyd trained on
    a content-addressed SAMPLE + one full-corpus GEMM assignment must
    induce the SAME partition of the data as full-corpus training on
    well-separated clusters — cluster numbering may differ (different
    deterministic inits), the grouping may not."""
    import numpy as np

    from rel_db_to_graph_spark.operators import ivf

    monkeypatch.setattr(ivf, "_GEMM_ASSIGN_MIN_K", 1)
    rng = np.random.default_rng(7)
    k, per = 6, 200
    centers = rng.normal(0, 50.0, size=(k, 4))     # far apart
    rows = []
    for ci in range(k):
        for j in range(per):
            v = centers[ci] + rng.normal(0, 0.5, size=4)
            # interleave ids across centers so the deterministic
            # lowest-id init seeds every true cluster in both runs
            rows.append((j * k + ci, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    full, _ = ivf.build_ivf_index(emb, k=k, iters=4)
    samp, _ = ivf.build_ivf_index(emb, k=k, iters=4, train_sample=300)

    fa = {r["vec_id"]: r["cluster"] for r in full.collect()}
    sa = {r["vec_id"]: r["cluster"] for r in samp.collect()}
    assert set(fa) == set(sa)
    # the induced partitions must be identical up to relabeling
    mapping: dict = {}
    for vid, fc in fa.items():
        sc = sa[vid]
        assert mapping.setdefault(fc, sc) == sc, (
            f"vector {vid}: full cluster {fc} split across sampled "
            f"clusters {mapping[fc]} and {sc}")
    assert len(set(mapping.values())) == len(mapping)   # bijective


def test_sampled_training_small_k_and_small_n_are_byte_identical(spark):
    """train_sample is ignored at small k (oracle-gated paths) and
    falls back to full training when the corpus fits the sample — both
    must return byte-identical assignments and centroids."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base, cb = build_ivf_index(emb, k=8, iters=2)
    # small k: the knob must not change anything
    samp, cs = build_ivf_index(emb, k=8, iters=2, train_sample=50)
    assert cb == cs
    assert [(r.vec_id, r.cluster) for r in
            base.orderBy("vec_id").collect()] == \
           [(r.vec_id, r.cluster) for r in
            samp.orderBy("vec_id").collect()]


def test_read_index_layout_legacy_fallback(spark, tmp_path):
    """ADVICE r11: an index written before the per-family sidecar
    rename carries a shared {path}/layout file — read_index_layout must
    fall back to it instead of silently degrading partition_buckets to
    0 (which drops the directory-pruning tier of a bucketed index)."""
    from rel_db_to_graph_spark.operators.ivf import read_index_layout

    root = str(tmp_path / "legacy_idx")
    # legacy shared sidecar only — no {sub}_layout
    (spark.createDataFrame([(7,)], "partition_buckets int")
     .coalesce(1).write.mode("overwrite").json(f"{root}/layout"))
    assert read_index_layout(spark, root, "vectors") == 7
    assert read_index_layout(spark, root, "codes") == 7
    # a per-family sidecar, once present, wins over the legacy one
    (spark.createDataFrame([(3,)], "partition_buckets int")
     .coalesce(1).write.mode("overwrite").json(f"{root}/vectors_layout"))
    assert read_index_layout(spark, root, "vectors") == 3
    assert read_index_layout(spark, root, "codes") == 7
    # nothing at all: degrade to 0 (pre-layout index)
    assert read_index_layout(spark, str(tmp_path / "nothing"), "vectors") == 0


def test_build_ivf_index_seed_and_corpus_n_plumbed(spark, monkeypatch):
    """ADVICE r11: the content-addressed sample draw must honor the
    seed exposed through the public wrappers, and a caller-supplied
    corpus_n must skip the extra count job while producing the same
    draw."""
    import rel_db_to_graph_spark.operators.ivf as ivf_mod

    monkeypatch.setattr(ivf_mod, "_GEMM_ASSIGN_MIN_K", 4)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    a1, c1 = ivf_mod.build_ivf_index(emb, k=4, iters=1, train_sample=30,
                                     seed=1)
    a2, c2 = ivf_mod.build_ivf_index(emb, k=4, iters=1, train_sample=30,
                                     seed=1, corpus_n=n)
    assert c1 == c2            # known-n shortcut: identical training
    a3, c3 = ivf_mod.build_ivf_index(emb, k=4, iters=1, train_sample=30,
                                     seed=2)
    # different seed -> different content-addressed sample; the Lloyd
    # means over a different subset differ on this data
    assert c3 != c1


def test_ivf_append_matches_frozen_rebuild(spark):
    """Round 12 (assign-only maintenance): appending vectors with
    frozen centroids must (a) leave every existing assignment
    untouched, (b) place each appended vector in exactly the cluster a
    full assignment pass at the same centroids gives it, and (c) cover
    base ∪ appended with no duplicates."""
    from rel_db_to_graph_spark.operators import ivf

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cut = (emb.agg(F.max("vec_id").alias("m")).collect()[0]["m"] * 4) // 5
    base = emb.filter(F.col("vec_id") <= cut)
    newv = emb.filter(F.col("vec_id") > cut)
    assigned, cents = build_ivf_index(base, k=8, iters=2)
    au = ivf.ivf_append(assigned, cents, newv)

    n_base, n_new = base.count(), newv.count()
    assert n_new > 0
    assert au.count() == n_base + n_new
    assert au.select("vec_id").distinct().count() == n_base + n_new

    # (a) base rows unchanged
    before = {r.vec_id: r.cluster for r in assigned.collect()}
    after = {r.vec_id: r.cluster
             for r in au.filter(F.col("vec_id") <= cut).collect()}
    assert before == after

    # (b) appended placement == a full _assign pass at the same centroids
    from rel_db_to_graph_spark.functions.vector import to_double
    nv = newv.select(F.col("vec_id"),
                     to_double(F.col("embedding")).alias("_v"))
    want = {r.vec_id: r.cluster for r in ivf._assign(nv, cents).collect()}
    got = {r.vec_id: r.cluster
           for r in au.filter(F.col("vec_id") > cut).collect()}
    assert want == got


def test_ivf_append_gemm_regime(spark, monkeypatch):
    """The appended-slice placement must survive the large-k GEMM
    kernel swap (the 100 TB regime): force the threshold down and pin
    placement equality against the literal-fold path."""
    import rel_db_to_graph_spark.operators.ivf as ivf_mod

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cut = (emb.agg(F.max("vec_id").alias("m")).collect()[0]["m"] * 4) // 5
    base = emb.filter(F.col("vec_id") <= cut)
    newv = emb.filter(F.col("vec_id") > cut)
    assigned, cents = build_ivf_index(base, k=8, iters=2)

    lit = {r.vec_id: r.cluster
           for r in ivf_mod.ivf_append(assigned, cents, newv)
           .filter(F.col("vec_id") > cut).collect()}
    monkeypatch.setattr(ivf_mod, "_GEMM_ASSIGN_MIN_K", 4)
    gemm = {r.vec_id: r.cluster
            for r in ivf_mod.ivf_append(assigned, cents, newv)
            .filter(F.col("vec_id") > cut).collect()}
    assert lit == gemm


def test_streaming_append_is_batching_invariant(spark, tmp_path):
    """Stream-accumulated frozen placement must equal the one-shot
    ivf_append of the same slice, regardless of micro-batch chop."""
    from rel_db_to_graph_spark.operators.ivf import build_ivf_index, ivf_append
    from rel_db_to_graph_spark.sources.catalog import load_table
    from rel_db_to_graph_spark.streaming.vector_ingest import (
        StreamingIndexAppender,
    )

    e = load_table(spark, SF_SMOKE, "embeddings")
    cut = (e.agg(F.max("vec_id").alias("m")).collect()[0]["m"] * 4) // 5
    base = e.filter(F.col("vec_id") <= cut)
    batch = e.filter(F.col("vec_id") > cut)
    assigned, cents = build_ivf_index(base, k=4, iters=2)

    feed = str(tmp_path / "feed")
    # three unequal chops, one possibly empty — the appender must not care
    for lo, hi in ((cut + 1, cut + 3), (cut + 4, cut + 200),
                   (cut + 201, 10**9)):
        (batch.filter(F.col("vec_id").between(lo, hi))
         .coalesce(1).write.mode("append").parquet(feed))
    appender = StreamingIndexAppender(assigned, cents)
    q = (spark.readStream.schema(e.schema)
         .option("maxFilesPerTrigger", 1).parquet(feed)
         .writeStream.foreachBatch(appender.apply)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    want = {(r.vec_id, r.cluster)
            for r in ivf_append(assigned, cents, batch).collect()}
    got = {(r.vec_id, r.cluster) for r in appender.assignment.collect()}
    assert got == want
