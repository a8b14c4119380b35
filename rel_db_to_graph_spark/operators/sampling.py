"""L2/L3 — neighbor sampling and negative sampling (LinkNeighborLoader
analog, dataloader.py:24-51).

Both use *content-addressed* pseudo-randomness (xxhash64 of the row key +
seed) instead of ``F.rand``: the sample is then a pure function of the
data, reproducible on any partitioning, restartable, and — critically for
the correctness harness — property-testable.

Scale shape of per-hop sampling: frontier ⋈ edges is an equi-join on src
(hash-partitioned, or broadcast while the frontier is small); the fanout
cut is a per-src window over a *bounded* partition (a node's out-edges),
ranked by the hash draw. No global sort, no collect; k hops = k joins,
with the frontier checkpointed between hops to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_neighbors(edges: DataFrame, frontier: DataFrame, fanout: int,
                     seed: int = 42, hop: int = 0) -> DataFrame:
    """≤ fanout out-edges per frontier node: (src, dst) sampled by
    hash-rank. fanout=-1 → full neighborhood (the reference's eval mode,
    dataloader.py:33)."""
    joined = edges.join(frontier.select("src").distinct(), "src")
    if fanout < 0:
        return joined.select("src", "dst")
    w = Window.partitionBy("src").orderBy(
        F.xxhash64("src", "dst", F.lit(seed + hop)), F.col("dst"))
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= fanout)
        .select("src", "dst")
    )


def sample_subgraph(edges: DataFrame, seeds: DataFrame, fanouts: list[int],
                    seed: int = 42) -> DataFrame:
    """Multi-hop neighborhood: union of per-hop sampled edges with the
    next frontier = sampled dst set. Returns (src, dst, hop)."""
    frontier = seeds.select("src")
    layers = []
    for hop, fanout in enumerate(fanouts):
        hop_edges = sample_neighbors(edges, frontier, fanout, seed, hop)
        layers.append(hop_edges.withColumn("hop", F.lit(hop)))
        frontier = hop_edges.select(F.col("dst").alias("src")).distinct()
        # lineage cut between hops: each hop's plan otherwise nests the
        # previous hop's window+join
        frontier = frontier.localCheckpoint(eager=False)
    out = layers[0]
    for df in layers[1:]:
        out = out.unionAll(df)
    return out


def negative_sample(positives: DataFrame, node_ids: DataFrame,
                    ratio: int = 1, seed: int = 42) -> DataFrame:
    """Binary negative sampling (neg_sampling='binary', dataloader.py:27):
    corrupt dst uniformly over the node set, reject collisions with
    positives (anti-join). Returns (src, dst, label) with positives
    label=1 and ≈ratio negatives label=0 per positive.

    The corrupt-dst draw is hash(src, dst, i, seed) mod n — computed
    against the *dense* node-id space, so no join against the node table
    is needed to draw, only the anti-join to reject false negatives.
    """
    n = node_ids.agg(F.max("node_id").alias("n")).collect()[0]["n"] + 1
    pos = positives.select("src", "dst", F.lit(1).alias("label"))
    negs = []
    for i in range(ratio):
        negs.append(
            positives.select(
                "src",
                F.pmod(F.xxhash64("src", "dst", F.lit(i), F.lit(seed)),
                       F.lit(n)).cast("long").alias("dst"),
                F.lit(0).alias("label"),
            )
        )
    neg = negs[0]
    for df in negs[1:]:
        neg = neg.unionAll(df)
    neg = neg.join(positives, ["src", "dst"], "left_anti")
    return pos.unionAll(neg)
