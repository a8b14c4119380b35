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


def _with_vec(embeddings: DataFrame, vec_col: str) -> DataFrame:
    return embeddings.withColumn("_v", to_double(F.col(vec_col)))


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
                             max_bucket: int | None = 1000) -> DataFrame:
    """(id_a, id_b, score) same-bucket pairs with cosine ≥ threshold.

    ``max_bucket`` is the same 100 TB safety valve as
    ``dedup.lsh_candidate_pairs``: one degenerate sign bucket (e.g. many
    near-zero embeddings all hashing to bucket 0) otherwise produces
    m²/2 candidate pairs. Buckets larger than the cap are dropped, which
    bounds the join's worst-case fan-out at max_bucket² independent of
    the data. ON by default; pass None explicitly for exhaustive pairs.
    """
    e = _with_vec(embeddings, vec_col).withColumn(
        "_bucket", sign_bucket(F.col("_v"), n_bits))
    if max_bucket is not None:
        sizes = e.groupBy("_bucket").agg(F.count("*").alias("_bn"))
        e = (e.join(sizes, "_bucket")
             .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a = e.select(F.col("_bucket"), F.col(id_col).alias("id_a"),
                 F.col("_v").alias("_va"))
    b = e.select(F.col("_bucket"), F.col(id_col).alias("id_b"),
                 F.col("_v").alias("_vb"))
    return (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )


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
