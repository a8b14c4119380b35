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

from rel_db_to_graph_spark.functions.vector import dot, sigmoid
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


def recommend_parts_gnn(spark: SparkSession, sf_dir: str, k: int = 10,
                        hidden: int = 2, layers: int = 1,
                        seed: int = 42,
                        quantize: bool = False) -> DataFrame:
    """The reference's FULL inference path (predict_songs, inference.py:44-76):
    graph mutation (G9) -> heterogeneous GNN forward (L5) -> dot-product
    decode + sigmoid (L6) -> top-k (A7), over orders-hasPart-part (the
    playlists-hasTrack-tracks analog).

    The new "playlist" node carries zero features + degree = |basket|+1
    (I:52-55: the reference's appended node has only the degree feature).
    Scoring pairs = one src × all candidate dst — the src embedding is a
    single broadcast row, so scoring is a scan over part embeddings, which
    is the plan that survives a 10^9-row part table.

    ``quantize=True`` runs the forward under the repo's 6-dp
    float-parity convention (ml/hetero.py), which makes the WHOLE
    inference path DuckDB-replayable: the decode dot is 2-term
    fixed-order math over quantized embeddings and the top-k ranks on
    round(sigmoid, 6) scores are integer-derived
    (oracle.py::_hetero_forward_q_sql(recommend_k=...)).
    """
    from rel_db_to_graph_spark.ml.hetero import hetero_gat_forward
    from rel_db_to_graph_spark.operators.graph_build import build_graph
    from rel_db_to_graph_spark.operators.mutate import mutate_for_inference

    g = build_graph(spark, sf_dir)

    # basket: dense part ids on the lowest-keyed order (same deterministic
    # anchor as recommend_parts; interactively this is the user's pick)
    li = load_table(spark, sf_dir, "lineitem")
    anchor = li.select(F.min("l_orderkey").alias("_ok"))
    basket_pks = (li.join(F.broadcast(anchor), F.col("l_orderkey") == F.col("_ok"))
                  .select("l_partkey").distinct())
    part_ids = g["nodes"]["part"].select("pk", "node_id")
    sel = sorted(int(r.node_id) for r in
                 basket_pks.join(part_ids, basket_pks.l_partkey == part_ids.pk)
                 .select("node_id").collect())

    m = mutate_for_inference(g, ("orders", "hasPart", "part"), sel)

    onodes = g["nodes"]["orders"]
    vals = {"node_id": m["new_node_id"], "pk": -1, "degree": len(sel) + 1}

    def as_field_type(field):
        v = vals.get(field.name, 0)
        return float(v) if field.dataType.simpleString() == "double" else int(v)

    new_row = spark.createDataFrame(
        [tuple(as_field_type(f) for f in onodes.schema.fields)],
        onodes.schema).coalesce(1)
    nodes = dict(g["nodes"])
    nodes["orders"] = onodes.unionByName(new_row)

    emb = hetero_gat_forward({"nodes": nodes, "edges": m["edges"]},
                             hidden=hidden, layers=layers, seed=seed,
                             quantize=quantize)
    src_emb = (emb["orders"]
               .filter(F.col("node_id") == m["new_node_id"])
               .select(F.col("emb").alias("_se")))
    scored = (
        m["candidates"]
        .join(emb["part"].withColumnsRenamed({"node_id": "dst", "emb": "_de"}),
              "dst")
        .crossJoin(F.broadcast(src_emb))
        .select("dst",
                F.round(sigmoid(dot(F.col("_se"), F.col("_de"))), 6)
                .alias("prob"))
    )
    # map dense ids back to part keys for a user-facing result (I:109-112)
    return (scored.join(part_ids.withColumnRenamed("node_id", "dst"), "dst")
            .select(F.col("pk").alias("p_partkey"), "prob")
            .orderBy(F.desc("prob"), F.col("p_partkey"))
            .limit(k))
