"""G9 + L6 + A7 — the flagship "recommend" query.

Reference behavior (inference.py:44-76): mutate the graph with a new
playlist node whose edges are the user-picked tracks, score every
*candidate* track (all tracks minus picked, the anti-join at
inference.py:68) with the dot-product decoder, sigmoid, top-k.

Spark re-expression over the star schema: "playlist" = an order, "tracks"
= parts. Given an order's basket of parts, score every not-in-basket part
by cosine similarity between its feature vector (p_size, p_retailprice)
and the basket centroid, decode to a probability with the sigmoid, return
top-k.

Scale shape: basket and centroid are tiny (broadcast); candidates are the
full part table (a scan); scoring is per-row codegen math; top-k is
TakeOrdered (no total sort). This is exactly the plan you want when
"part" is 10^9 rows.

Determinism: sums for the centroid go through a decimal cast so the
result is independent of partition/merge order; ties in the top-k are
broken by part key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rel_db_to_graph_spark.functions.vector import sigmoid
from rel_db_to_graph_spark.sources.catalog import load_table


def exact_avg(col: F.Column) -> F.Column:
    """Order-independent mean: decimal-exact sum, then one double divide."""
    return (F.sum(col.cast("decimal(27,6)")).cast("double") / F.count(col))


def recommend_parts(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k part recommendations for the lowest-keyed order (deterministic
    anchor so the same query is comparable across scale factors).

    Returns (p_partkey, score, prob) — score = cosine to basket centroid
    rounded to 6, prob = sigmoid(score).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    anchor = lineitem.select(F.min("l_orderkey").alias("_ok"))
    basket = (
        lineitem.join(F.broadcast(anchor), F.col("l_orderkey") == F.col("_ok"))
        .select("l_partkey").distinct()
    )

    centroid = (
        part.join(F.broadcast(basket), part.p_partkey == basket.l_partkey)
        .agg(exact_avg(F.col("p_size")).alias("cx"),
             exact_avg(F.col("p_retailprice")).alias("cy"))
    )

    candidates = part.join(basket, part.p_partkey == basket.l_partkey, "left_anti")

    px = F.col("p_size").cast("double")
    py = F.col("p_retailprice").cast("double")
    dot = px * F.col("cx") + py * F.col("cy")
    score = F.round(
        dot / (F.sqrt(px * px + py * py) * F.sqrt(F.col("cx") * F.col("cx")
                                                  + F.col("cy") * F.col("cy"))),
        6,
    )
    return (
        candidates.crossJoin(F.broadcast(centroid))
        .select("p_partkey", score.alias("score"))
        .withColumn("prob", F.round(sigmoid(F.col("score")), 6))
        .orderBy(F.desc("score"), F.col("p_partkey"))
        .limit(k)
    )
