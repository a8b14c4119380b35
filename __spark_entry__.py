"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship graph query; ``queries()`` /
``oracle_sql()`` expose the SURVEY.md §2 operator inventory for the
driver's DuckDB correctness harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rel_db_to_graph_spark import oracle as _oracle
from rel_db_to_graph_spark import queries as Q

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: infer the graph schema from the registry, build
    dense-id nodes + edges, compute degree features, and return the
    top-10 highest-degree customers with their features (G1-G5 + A7 in
    one lineage)."""
    from pyspark.sql import functions as F

    from rel_db_to_graph_spark.operators.graph_build import node_frame
    from rel_db_to_graph_spark.queries import q_degree

    deg = q_degree(spark, _SF0001)
    feats = node_frame(spark, _SF0001, "customer")
    return (
        feats.join(deg, "node_id")
        .select("node_id", "pk", "c_acctbal", "degree")
        .orderBy(F.desc("degree"), F.col("node_id"))
        .limit(10)
    )


# Dict ORDER is load-bearing: the driver's correctness sweep checks the
# first 50 entries per round. Rounds 1-3 never rotated, so positions
# 51-75 (the whole events/ANN/stats tier) went driver-unverified — and
# that's exactly where the round-3 ts bug hid. Rounds 4-5 rotated by
# hand and round 5 miscounted, committing a guaranteed staleness
# failure (VERDICT r5 item 1). The order is therefore no longer
# hand-maintained: ``queries()`` derives it from the committed
# CORRECTNESS_r*.json files — never-checked first, then stalest last
# green round, ties broken by registry position. Stale queries always
# sort to the front (inside the window), so the staleness failure
# class is structurally dead. tests/test_driver_window.py enforces
# both invariants against the same files.
#
# QUERIES below is the REGISTRY (grouped by tier for readability);
# its literal order only breaks ties.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "audio_meta": Q.q_audio_meta,
    "video_meta": Q.q_video_meta,
    "bpe_train_raw": Q.q_bpe_train_raw,
    "semantic_dedup": Q.q_semantic_dedup,
    "ann_index_variants": Q.q_ann_index_variants,
    "term_cms": Q.q_term_cms,
    "dup_spans": Q.q_dup_spans,
    "lm_nll": Q.q_lm_nll,
    "curation_pipeline": Q.q_curation_pipeline,
    "bpe_train": Q.q_bpe_train,
    "bpe_tokenize": Q.q_bpe_tokenize,
    "dsir_select": Q.q_dsir_select,
    "knn_classify": Q.q_knn_classify,
    "label_prop": Q.q_label_prop,
    "graph_features": Q.q_graph_features,
    "node_strength": Q.q_node_strength,
    "assortativity": Q.q_assortativity,
    "centrality_audit": Q.q_centrality_audit,
    "cdc_batch_variants": Q.q_cdc_batch_variants,
    "profile_orders": Q.q_profile_orders,
    "quality_lr_score": Q.q_quality_lr_score,
    "quality_lr_train": Q.q_quality_lr_train,
    "corpus_mix_temp": Q.q_corpus_mix_temp,
    "dense_ids_increment": Q.q_dense_ids_increment,
    "graph_increment": Q.q_graph_increment,
    "edges_attr": Q.q_edges_attr,
    "msg_agg_weighted": Q.q_msg_agg_weighted,
    "key_skew": Q.q_key_skew,
    "zorder_key": Q.q_zorder_key,
    "hetero_link_train_sampled": Q.q_hetero_link_train_sampled,
    "layout_compact": Q.q_layout_compact,
    "gat_stack_train_variants": Q.q_gat_stack_train_variants,
    "gat_stack_train_q": Q.q_gat_stack_train_q,
    "gat_stack_train_sampled_q": Q.q_gat_stack_train_sampled_q,
    "hetero_neighbor_sample": Q.q_hetero_neighbor_sample,
    "hetero_link_train": Q.q_hetero_link_train,
    "token_pack": Q.q_token_pack,
    "chunk_fill": Q.q_chunk_fill,
    "pii_scrub": Q.q_pii_scrub,
    "incremental_dedup": Q.q_incremental_dedup,
    "corpus_mix": Q.q_corpus_mix,
    "pagerank": Q.q_pagerank,
    "copurchase": Q.q_copurchase,
    "triangle_count": Q.q_triangle_count,
    "clustering_coeff": Q.q_clustering_coeff,
    "node_jaccard": Q.q_node_jaccard,
    "graph_bfs": Q.q_graph_bfs,
    "cluster_rep": Q.q_cluster_rep,
    "event_unpivot": Q.q_event_unpivot,
    "k_core": Q.q_k_core,
    "triangle_increment": Q.q_triangle_increment,
    "small_lots": Q.q_small_lots,
    "dense_ids_variants": Q.q_dense_ids_variants,
    "hash_sample": Q.q_hash_sample,
    "sample_topk": Q.q_sample_topk,
    "doc_chunks": Q.q_doc_chunks,
    "repetition": Q.q_repetition,
    "near_dup_pairs": Q.q_near_dup_pairs,
    "dedup_clusters": Q.q_dedup_clusters,
    "embedding_dedup": Q.q_embedding_dedup,
    "corpus_stats_approx_err": Q.q_corpus_stats_approx_err,
    "text_quality": Q.q_text_quality,
    "lang_id": Q.q_lang_id,
    "fingerprint": Q.q_fingerprint,
    "scan_project": Q.q_scan_project,
    "filter_like": Q.q_filter_like,
    "semi_join": Q.q_semi_join,
    "anti_join": Q.q_anti_join,
    "three_table_join": Q.q_three_table_join,
    "json_props": Q.q_json_props,
    "one_hot": Q.q_one_hot,
    "topk_orders": Q.q_topk_orders,
    "hetero_forward": Q.q_hetero_forward,
    "hetero_forward_q": Q.q_hetero_forward_q,
    "recommend_gnn": Q.q_recommend_gnn,
    "link_pred_train": Q.q_link_pred_train,
    "link_split": Q.q_link_split,
    "negative_sample": Q.q_negative_sample,
    "neighbor_sample": Q.q_neighbor_sample,
    "events_asof": Q.q_events_asof,
    "funnel_variants": Q.q_funnel_variants,
    "hourly_variants": Q.q_hourly_variants,
    "events_sessionize": Q.q_events_sessionize,
    "events_attribution": Q.q_events_attribution,
    "cdc_stream": Q.q_cdc_stream,
    "hetero_link_train_sampled_q": Q.q_hetero_link_train_sampled_q,
    "stream_variants": Q.q_stream_variants,
    "retention_cohorts": Q.q_retention_cohorts,
    "event_anomalies": Q.q_event_anomalies,
    "tfidf_keywords": Q.q_tfidf_keywords,
    "bm25_retrieval": Q.q_bm25_retrieval,
    "simhash_near_dup": Q.q_simhash_near_dup,
    "term_topk": Q.q_term_topk,
    "corpus_stats": Q.q_corpus_stats,
    "multimodal_meta": Q.q_multimodal_meta,
    "salted_agg": Q.q_salted_agg,
    "degree_histogram": Q.q_degree_histogram,
    "decontaminate": Q.q_decontaminate,
    "frame_sample": Q.q_frame_sample,
    "source_quota": Q.q_source_quota,
    "simhash": Q.q_simhash,
    "ngram_jaccard": Q.q_ngram_jaccard,
    "ann_brute": Q.q_ann_brute,
    "ann_variants": Q.q_ann_variants,
    "corpus_clean": Q.q_corpus_clean,
    "rollup_pricing": Q.q_rollup_pricing,
    "cube_pricing": Q.q_cube_pricing,
    "topn_per_group": Q.q_topn_per_group,
    "catalog_tables": Q.q_catalog_tables,
    "edge_catalog": Q.q_edge_catalog,
    "metadata_union": Q.q_metadata_union,
    "pricing_summary": Q.q_pricing_summary,
    "revenue_by_nation": Q.q_revenue_by_nation,
    "eval_metrics": Q.q_eval_metrics,
    "node_features": Q.q_node_features,
    "edges_fk": Q.q_edges_fk,
    "edges_junction": Q.q_edges_junction,
    "degree": Q.q_degree,
    "hetero_counts": Q.q_hetero_counts,
    "self_loops": Q.q_self_loops,
    "msg_agg": Q.q_msg_agg,
    "recommend": Q.q_recommend,
    "text_stats": Q.q_text_stats,
    "exact_dedup": Q.q_exact_dedup,
    "minhash": Q.q_minhash,
}


def _last_verified_round() -> dict[str, int]:
    """Latest driver round each query earned a GREEN CORRECTNESS row
    in (hash-match for oracle-backed, row-count for rows-only),
    derived from the committed CORRECTNESS_r*.json files (0 = never).
    Errored or mismatched rows do NOT count, so a query that failed
    its last check sorts back into the window after its fix.

    A rows-only green counts ONLY while the query still has no oracle
    entry: when a query is upgraded from rows-only to oracle-backed,
    its old ``no_oracle`` greens stop counting, it re-sorts to the
    never-checked front of the window, and the upgrade earns its first
    HASH-checked driver row in the very next round instead of waiting
    out a full rotation."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
            with open(path) as fh:
                rows = json.load(fh)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = (
                row.get("hash_match") is True
                or (row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                    and name not in _oracle.ORACLES)
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    never-checked-first / stalest-first so the driver's 50-entry
    correctness window always re-verifies the least-recently-verified
    queries (VERDICT r5 item 1: derived, not hand-maintained)."""
    last = _last_verified_round()
    pos = {name: i for i, name in enumerate(QUERIES)}
    ordered = sorted(QUERIES, key=lambda n: (last.get(n, 0), pos[n]))
    return {name: QUERIES[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — 120 of the 124 registry queries, including the
    seeded/sampled ops (md5-draw variants since round 7), the
    retraining twins (BPE, IRLS, plain-GD link_pred_train,
    gat_stack_train_q, its sampled sibling, and — round 10 — the
    FLAGSHIP hetero sampled trainer hetero_link_train_sampled_q) and
    the forward-replay twin (hetero_forward_q). The four absent keys
    are the AdamW/unquantized-float originals (hetero_forward,
    hetero_link_train, hetero_link_train_sampled,
    gat_stack_train_variants): gradient float sums are not quantized,
    so cross-engine bit-exactness is impossible by design — and every
    one of them now has a hash-checked quantized sibling at the same
    tier → rows-only checks plus numpy twins and exactness-anchor
    tests."""
    return dict(_oracle.ORACLES)
