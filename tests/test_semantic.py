"""Semantic dedup (operators/semantic.py): survivor-rule invariants,
determinism, and the max_cluster safety valve. Oracle parity for
``semantic_dedup`` runs in test_oracle_parity via the driver inventory."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.semantic import (
    semantic_dedup,
    semantic_survivors,
)
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _flags(spark, **kw):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return semantic_dedup(emb, threshold=0.2, n_clusters=4, iters=2, **kw)


def test_partition_and_lowest_id_survives(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    flags = _flags(spark, max_cluster=None)
    rows = flags.collect()
    assert len(rows) == emb.count()
    # the lowest id of every cluster has no lower-id neighbour -> kept
    lowest = (flags.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
              .join(flags, ["cluster", "vec_id"]))
    assert lowest.filter(~F.col("kept")).count() == 0
    # something was actually pruned at this threshold
    assert flags.filter(~F.col("kept")).count() > 0


def test_deterministic(spark):
    a = sorted(map(tuple, _flags(spark, max_cluster=None).collect()))
    b = sorted(map(tuple, _flags(spark, max_cluster=None).collect()))
    assert a == b


def test_max_cluster_cap_only_reduces_drops(spark):
    """Capping the comparison partners can only KEEP more (drop fewer):
    survivors(exhaustive) ⊆ survivors(capped)."""
    exhaustive = {r.vec_id for r in
                  _flags(spark, max_cluster=None).filter("kept").collect()}
    capped = {r.vec_id for r in
              _flags(spark, max_cluster=1).filter("kept").collect()}
    assert exhaustive <= capped


def test_survivors_matches_flags(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    flags = semantic_dedup(emb, threshold=0.2, n_clusters=4, iters=2,
                           max_cluster=None)
    surv = semantic_survivors(emb, threshold=0.2, n_clusters=4, iters=2,
                              max_cluster=None)
    assert ({r.vec_id for r in surv.collect()}
            == {r.vec_id for r in flags.filter("kept").collect()})


def test_gemm_kernel_matches_scalar_join(spark):
    """The Arrow GEMM cell kernel (round 9) is pure throughput: routing
    EVERY cluster through it (gemm_min_pairs=0... well, 1) must give
    bit-identical flags to the all-scalar path (gemm_min_pairs huge),
    and to a mixed routing — same grid, same survivor rule, only the
    per-cell cosine evaluator differs."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = sorted(map(tuple, semantic_dedup(
        emb, threshold=0.2, n_clusters=4, iters=2, max_cluster=None,
        gemm_min_pairs=10**12).collect()))
    all_gemm = sorted(map(tuple, semantic_dedup(
        emb, threshold=0.2, n_clusters=4, iters=2, max_cluster=None,
        gemm_min_pairs=1).collect()))
    # mixed: sf0.001 clusters hold ~40-100 vectors → ~2k-10k pairs, so
    # a 4k cut routes some clusters to GEMM and keeps some scalar
    mixed = sorted(map(tuple, semantic_dedup(
        emb, threshold=0.2, n_clusters=4, iters=2, max_cluster=None,
        gemm_min_pairs=4000).collect()))
    assert base == all_gemm == mixed


def test_gemm_kernel_with_capped_mode(spark):
    """GEMM routing composes with the max_cluster production cap: the
    capped left side must prune identically through either kernel."""
    a = sorted(map(tuple, _flags(spark, max_cluster=30,
                                 gemm_min_pairs=1).collect()))
    b = sorted(map(tuple, _flags(spark, max_cluster=30,
                                 gemm_min_pairs=10**12).collect()))
    assert a == b


def test_empty_input_short_circuits(spark):
    """ADVICE r8: an empty embeddings frame must return an empty flags
    frame, not IndexError in the grid sizing."""
    emb = load_table(spark, SF_SMOKE, "embeddings").filter("vec_id < 0")
    out = semantic_dedup(emb, threshold=0.2, n_clusters=2, iters=1,
                         max_cluster=None)
    assert out.columns == ["vec_id", "cluster", "kept"]
    assert out.count() == 0


def test_salt_does_not_change_results(spark):
    """The pair-join salt is pure parallelism: any salt width gives
    bit-identical flags (every pair meets exactly once)."""
    a = sorted(map(tuple, _flags(spark, max_cluster=None).collect()))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    b = sorted(map(tuple, semantic_dedup(
        emb, threshold=0.2, n_clusters=4, iters=2, max_cluster=None,
        salt=1).collect()))
    c = sorted(map(tuple, semantic_dedup(
        emb, threshold=0.2, n_clusters=4, iters=2, max_cluster=None,
        salt=7).collect()))
    assert a == b == c


def test_web_scale_k_routing_compiles_and_runs(spark):
    """Round-10 `weak` fix, measured: at the module's advertised
    web-scale recipe the routing metadata must not be O(n_clusters)
    Catalyst literals. Build a ~4000-vector frame (8 id-offset,
    slightly-perturbed replicas of the real embeddings table) and run
    semantic_dedup at n_clusters=2000 — the old nested-`when` /
    `isin` routing could not compile plans of this width, and ivf's
    literal argmin could not either (2000 x 64-dim literal folds per
    Lloyd pass); the broadcast route frame + GEMM assignment make the
    whole operator plan-size-flat in k. Asserts it completes with the
    survivor invariants intact."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    reps = [emb.select(
        (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
        F.transform("embedding",
                    lambda x: x + F.lit(float(i)) * F.lit(0.001))
        .alias("embedding")) for i in range(8)]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    flags = semantic_dedup(big, threshold=0.2, n_clusters=2000, iters=1,
                           max_cluster=None, salt=1,
                           gemm_min_pairs=10**12)
    rows = flags.collect()
    assert len(rows) == 8 * 500
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    # >> 8 distinct clusters actually materialized (the k axis is real)
    assert len(by_cluster) > 200
    # lowest id per cluster always survives
    for members in by_cluster.values():
        assert min(members, key=lambda r: r.vec_id).kept


def test_max_cluster_cap_exact_partner_set(spark):
    """Round 10: the capped mode's narrow-window id cap (broadcast
    (cluster, _cap) join — the wide-row row_number filter it replaced
    sorted full vectors through one task per megacluster) must select
    EXACTLY the max_cluster lowest-id comparison partners. Reference
    semantics recomputed in numpy on the same deterministic
    assignment."""
    import numpy as np

    from rel_db_to_graph_spark.operators.ivf import build_ivf_index

    emb = load_table(spark, SF_SMOKE, "embeddings")
    m = 5
    assigned, _ = build_ivf_index(emb, k=4, iters=2)
    by_cluster: dict[int, list] = {}
    for r in assigned.collect():
        by_cluster.setdefault(r.cluster, []).append(
            (r.vec_id, np.asarray(r._v, dtype="float64")))
    expected_drop = set()
    for mem in by_cluster.values():
        mem.sort(key=lambda t: t[0])
        partners = mem[:m]
        for vid, v in mem:
            for pid, pv in partners:
                if pid >= vid:
                    break
                raw = float(pv @ v) / float(
                    np.linalg.norm(pv) * np.linalg.norm(v))
                cos = np.sign(raw) * np.floor(abs(raw) * 1e6 + 0.5) / 1e6
                if cos >= 0.2:
                    expected_drop.add(vid)
                    break
    got_drop = {r.vec_id
                for r in _flags(spark, max_cluster=m)
                .filter("NOT kept").collect()}
    assert got_drop == expected_drop
