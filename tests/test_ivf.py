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
