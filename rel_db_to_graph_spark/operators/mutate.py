"""G9 — interactive-inference graph mutation (predict_songs, inference.py:44-71).

Observed reference semantics, reproduced faithfully (SURVEY.md §2 G9):
  * append ONE new node of the target type, dense id = N (one past the
    existing ids), with degree feature = len(selected)+1 (I:52-55);
  * REPLACE — not append — the (src, rel, dst) edge_index with only the
    new node's edges (I:58-59: the assignment overwrites the edge type's
    tensor; a quirk, but it is what the model sees at inference);
  * same for the reverse edge type;
  * append the new node's self-loop (I:62-64);
  * candidate scoring pairs = new node × (all dst nodes − selected)
    (the anti-join at I:68).

``mutate_for_inference`` returns the mutated edge dict + the candidate
pair frame; scoring/top-k stays in the recommend operator. Everything is
unions/anti-joins over the existing frames — no collected state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mutate_for_inference(graph: dict, edge_type: tuple[str, str, str],
                         selected_dst_ids: list[int]) -> dict:
    """Returns {'edges': mutated edge dict, 'new_node_id': int,
    'candidates': DF(src, dst)} for one new src-type node whose neighbors
    are ``selected_dst_ids`` (dense ids in the dst space)."""
    src_t, rel, dst_t = edge_type
    spark = graph["nodes"][src_t].sparkSession

    n_src = graph["nodes"][src_t].agg(
        F.max("node_id").alias("m")).collect()[0]["m"] + 1
    new_id = int(n_src)

    sel = spark.createDataFrame([(d,) for d in selected_dst_ids], "dst long") \
        .coalesce(1)
    new_edges = sel.select(F.lit(new_id).cast("long").alias("src"), "dst")

    edges = dict(graph["edges"])
    # REPLACE semantics (I:58-59) — the target edge type now holds ONLY
    # the new node's edges
    edges[edge_type] = new_edges
    rev_key = (dst_t, f"REVERSE_{rel}", src_t)
    if rev_key in edges:
        edges[rev_key] = new_edges.select(F.col("dst").alias("src"),
                                          F.col("src").alias("dst"))
    # self-loop append (I:62-64)
    loop_key = (src_t, "SELF_LOOP", src_t)
    if loop_key in edges:
        new_loop = spark.createDataFrame(
            [(new_id, new_id)], "src long, dst long").coalesce(1)
        edges[loop_key] = edges[loop_key].unionAll(new_loop)

    # candidates = all dst nodes minus selected (I:68)
    candidates = (
        graph["nodes"][dst_t].select(F.col("node_id").alias("dst"))
        .join(sel, "dst", "left_anti")
        .select(F.lit(new_id).cast("long").alias("src"), "dst")
    )
    return {"edges": edges, "new_node_id": new_id, "candidates": candidates}
