"""Product quantization (operators/pq.py): code validity, determinism,
and an exactness anchor — when every vector gets its own code
(k = corpus size, distinct subvectors) quantization is lossless and the
ADC estimate equals the true squared L2 distance. Oracle parity for
``ann_pq`` runs in test_oracle_parity via the driver inventory."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.pq import encode_pq, pq_topk, train_pq
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE

VECS = [
    (0, [0.0, 1.0, 2.0, 3.0]),
    (1, [1.0, 0.0, 0.5, 2.0]),
    (2, [4.0, 4.0, 4.0, 4.0]),
    (3, [-1.0, 2.0, 0.0, 1.0]),
    (4, [0.5, 0.5, 3.0, 0.0]),
    (5, [2.0, -2.0, 1.0, 1.0]),
]


def _tiny(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def test_codes_valid_and_count_preserved(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = train_pq(emb, m=4, k=8, iters=1)
    codes = encode_pq(emb, books)
    assert codes.count() == emb.count()
    bad = codes.filter(
        F.exists("codes", lambda c: (c < 0) | (c >= 8))
        | (F.size("codes") != 4))
    assert bad.count() == 0


def test_pq_topk_deterministic(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = pq_topk(emb, query_id=0, k=5, m=4, n_codes=8, iters=1).collect()
    b = pq_topk(emb, query_id=0, k=5, m=4, n_codes=8, iters=1).collect()
    assert [(r.vec_id, r.adist) for r in a] == [(r.vec_id, r.adist) for r in b]


def test_lossless_when_every_vector_has_its_own_code(spark):
    """k = |corpus| with distinct subvectors: each subvector is its own
    centroid, so ADC distance == exact squared L2 distance and the PQ
    ranking equals the exact ranking."""
    df = _tiny(spark)
    got = pq_topk(df, query_id=0, k=5, m=2, n_codes=6, iters=2).collect()
    q = dict(VECS)[0]
    exact = sorted(
        ((sum((a - b) * (a - b) for a, b in zip(q, v)), i)
         for i, v in VECS if i != 0))
    assert [(r.vec_id, r.adist) for r in got] == [
        (i, round(d, 6)) for d, i in exact]


def test_dim_not_divisible_raises(spark):
    with pytest.raises(ValueError):
        train_pq(_tiny(spark), m=3, k=2, iters=1)


def test_ivfpq_full_probe_equals_pq(spark):
    """nprobe = n_clusters disables coarse pruning -> IVFPQ must equal
    plain PQ exactly (same codebooks, same ADC)."""
    from rel_db_to_graph_spark.operators.pq import ivfpq_topk
    emb = load_table(spark, SF_SMOKE, "embeddings")
    full = ivfpq_topk(emb, query_id=0, k=10, n_clusters=4, nprobe=4,
                      m=4, n_codes=8, iters=1).collect()
    plain = pq_topk(emb, query_id=0, k=10, m=4, n_codes=8,
                    iters=1).collect()
    assert [(r.vec_id, r.adist) for r in full] == [
        (r.vec_id, r.adist) for r in plain]


def test_ivfpq_bucketed_layout_probe_equals_plain(spark):
    """Round 10: write_ivfpq_index(partition_buckets=N) — the large-k
    directory layout — must probe to exactly the per-cluster-directory
    layout's rows (same codebooks, same coarse probe, same ADC)."""
    import tempfile

    from rel_db_to_graph_spark.operators.pq import (
        ivfpq_topk_from_index, write_ivfpq_index)

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        write_ivfpq_index(emb, d1, n_clusters=8, m=4, n_codes=8, iters=2)
        write_ivfpq_index(emb, d2, n_clusters=8, m=4, n_codes=8, iters=2,
                          partition_buckets=4)
        plain = ivfpq_topk_from_index(spark, d1, qv, k=11, nprobe=4)
        bucketed = ivfpq_topk_from_index(spark, d2, qv, k=11, nprobe=4)
        assert [(r.vec_id, r.adist) for r in bucketed.collect()] == \
               [(r.vec_id, r.adist) for r in plain.collect()]


def test_shared_root_sidecars_do_not_clobber(spark):
    """ADVICE r10: an IVF index (sub="vectors") and an IVFPQ index
    (sub="codes") written to the SAME root with DIFFERENT
    partition_buckets keep independent layout sidecars — each family's
    probe reads its own bucket count and still answers correctly."""
    import tempfile

    from rel_db_to_graph_spark.operators.ivf import (
        ivf_topk_from_index, read_index_layout, write_ivf_index)
    from rel_db_to_graph_spark.operators.pq import (
        ivfpq_topk_from_index, write_ivfpq_index)

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    with tempfile.TemporaryDirectory() as d, \
            tempfile.TemporaryDirectory() as ref:
        # same root: bucketed IVF + per-cluster IVFPQ (written second,
        # so a shared sidecar would have been clobbered to 0)
        write_ivf_index(emb, d, k=8, iters=2, partition_buckets=4)
        write_ivfpq_index(emb, d, n_clusters=8, m=4, n_codes=8, iters=2)
        assert read_index_layout(spark, d, "vectors") == 4
        assert read_index_layout(spark, d, "codes") == 0
        write_ivf_index(emb, ref, k=8, iters=2, partition_buckets=4)
        want = ivf_topk_from_index(spark, ref, query_id=0, k=10,
                                   nprobe=4).collect()
        got = ivf_topk_from_index(spark, d, query_id=0, k=10,
                                  nprobe=4).collect()
        assert [(r.vec_id, r.score) for r in got] == \
               [(r.vec_id, r.score) for r in want]
        # and the co-located IVFPQ probe still answers
        assert ivfpq_topk_from_index(spark, d, qv, k=5,
                                     nprobe=4).count() == 5


def test_ivfpq_append_matches_frozen_rebuild(spark):
    """Appended rows must get byte-identical codes AND clusters to a
    frozen-quantizer rebuild: encode_pq/assignment over the full corpus
    with the base-trained books/centroids equals the append path."""
    from rel_db_to_graph_spark.operators.ivf import build_ivf_index
    from rel_db_to_graph_spark.operators.pq import ivfpq_append

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cut = (emb.agg(F.max("vec_id").alias("m")).collect()[0]["m"] * 4) // 5
    eb = emb.filter(F.col("vec_id") <= cut)
    en = emb.filter(F.col("vec_id") > cut)
    assert en.count() > 0

    assigned, cents = build_ivf_index(eb, k=4, iters=2)
    books = train_pq(eb, m=4, k=4, iters=2)
    codes_b = encode_pq(eb, books)
    codes_u, au = ivfpq_append(codes_b, assigned, books, cents, en)

    # frozen rebuild: same books/centroids applied to the whole corpus
    want_codes = {r.vec_id: list(r.codes)
                  for r in encode_pq(emb, books).collect()}
    got_codes = {r.vec_id: list(r.codes) for r in codes_u.collect()}
    assert got_codes == want_codes

    rebuilt, _ = build_ivf_index(eb, k=4, iters=2)
    from rel_db_to_graph_spark.operators.ivf import ivf_append
    want_clusters = {r.vec_id: r.cluster
                     for r in ivf_append(rebuilt, cents, emb.filter(
                         F.col("vec_id") > cut)).collect()}
    got_clusters = {r.vec_id: r.cluster for r in au.collect()}
    for vid in want_clusters:
        if vid > cut:
            assert got_clusters[vid] == want_clusters[vid]
    assert set(got_clusters) == set(want_codes)
