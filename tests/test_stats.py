"""Corpus stats — sketch tier pinned against the exact tier with
relative-error bounds; heavy-hitter plan is TakeOrdered."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.stats import (
    corpus_stats,
    corpus_stats_approx,
    term_topk,
)
from tests.conftest import SF_ORACLE
from tests.test_plans import plan_of


def _docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def test_approx_within_error_bounds(spark):
    exact = corpus_stats(_docs(spark)).collect()[0]
    approx = corpus_stats_approx(_docs(spark)).collect()[0]
    assert approx.n_docs == exact.n_docs            # plain count, exact
    assert approx.total_tokens == exact.total_tokens
    # HLL at rsd=0.05 on tiny cardinalities is essentially exact
    assert abs(approx.n_langs - exact.n_langs) <= 1
    assert abs(approx.n_sources - exact.n_sources) <= 1
    # percentile_approx with accuracy 10k: within one rank-step
    assert abs(approx.tok_p50 - exact.tok_p50) / max(exact.tok_p50, 1) < 0.05
    assert approx.tok_p25 <= approx.tok_p50 <= approx.tok_p75
    assert approx.tok_min == exact.tok_min and approx.tok_max == exact.tok_max


def test_exact_stats_sane(spark):
    r = corpus_stats(_docs(spark)).collect()[0]
    assert r.n_docs == 500
    assert r.tok_min <= r.tok_p25 <= r.tok_p50 <= r.tok_p75 <= r.tok_max
    assert r.tok_min <= r.tok_mean <= r.tok_max


def test_term_topk_exact_and_ordered(spark):
    rows = term_topk(_docs(spark), k=10).collect()
    assert len(rows) == 10
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    # tie-break total order: equal counts sorted by term
    for a, b in zip(rows, rows[1:]):
        if a.n == b.n:
            assert a.term < b.term


def test_term_topk_plan_is_take_ordered(spark):
    p = plan_of(term_topk(_docs(spark), k=10))
    assert "TakeOrderedAndProject" in p
    # map-side combine: partial agg below the exchange
    assert p.count("HashAggregate") >= 2


def test_chunk_spans_overlap_and_coverage(spark):
    from rel_db_to_graph_spark.operators.text import chunk_spans

    text = "abcdefghijklmnopqrstuvwxyz" * 10   # 260 chars
    df = spark.createDataFrame([(1, text)], "id long, norm string")
    rows = (df.select(F.explode(chunk_spans(F.col("norm"), 100, 20)).alias("c"))
            .select("c.chunk_id", "c.chunk_text").collect())
    # stride 80: ceil((260-20)/80) = 3 chunks
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text[-20:] == b.chunk_text[:20]   # shared overlap
    # stitched-back chunks reconstruct the original
    stitched = rows[0].chunk_text + "".join(r.chunk_text[20:] for r in rows[1:])
    assert stitched == text


def test_chunk_spans_short_doc_single_window(spark):
    from rel_db_to_graph_spark.operators.text import chunk_spans

    df = spark.createDataFrame([(1, "tiny")], "id long, norm string")
    rows = (df.select(F.explode(chunk_spans(F.col("norm"), 100, 20)).alias("c"))
            .collect())
    assert len(rows) == 1 and rows[0].c.chunk_text == "tiny"


def test_repetition_ratio_extremes(spark):
    from rel_db_to_graph_spark.operators.text import repetition_ratios

    df = spark.createDataFrame(
        [(1, ["spam"] * 40),                        # fully repeated
         (2, [f"w{i}" for i in range(40)])],        # all unique
        "id long, toks array<string>")
    r2, r3 = repetition_ratios(F.col("toks"))
    rows = {r.id: r for r in
            df.select("id", r2.alias("d2"), r3.alias("d3")).collect()}
    assert rows[1].d2 > 0.97 and rows[1].d3 > 0.97
    assert rows[2].d2 == 0.0 and rows[2].d3 == 0.0


def test_cms_upper_bound_and_fixed_memory(spark):
    """CMS: est >= exact for every audited term (collisions only add),
    the counter table never exceeds depth*width cells, and a narrow
    sketch shows real overcounts while the bound holds."""
    from rel_db_to_graph_spark.operators.stats import cms_audit, cms_counters
    d = _docs(spark)
    audit = cms_audit(d, k=20, width=32, depth=4).collect()
    assert len(audit) == 20
    assert all(r.is_upper_bound for r in audit)
    assert any(r.est_n > r.exact_n for r in audit)   # width 32 collides
    assert cms_counters(d, width=32, depth=4).count() <= 32 * 4
    # widening the sketch can only tighten estimates
    wide = {r.term: r.est_n for r in
            cms_audit(d, k=20, width=256, depth=4).collect()}
    narrow = {r.term: r.est_n for r in audit}
    assert all(wide[t] <= narrow[t] for t in wide)


def test_cms_deterministic(spark):
    from rel_db_to_graph_spark.operators.stats import cms_audit
    a = sorted(map(tuple, cms_audit(_docs(spark), k=10).collect()))
    b = sorted(map(tuple, cms_audit(_docs(spark), k=10).collect()))
    assert a == b


def test_profile_table_one_scan_and_values(spark):
    from rel_db_to_graph_spark.operators.profile import profile_table
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, None, 4.0), (2, "b", None)],
        "k long, s string, x double")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["k"]["n_distinct"] == 2 and rows["k"]["n_nulls"] == 0
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["min_str"] == "a"
    assert rows["x"]["n_nulls"] == 1 and rows["x"]["max_num"] == 4.0
    assert rows["s"]["min_num"] is None
    # single scan: exactly one aggregate over one relation in the plan
    plan = (profile_table(df)._jdf.queryExecution().optimizedPlan()
            .toString())
    assert plan.count("LogicalRDD") == 1


def test_bm25_retrieval_shape_and_ranking(spark):
    from rel_db_to_graph_spark.operators.stats import bm25_retrieval
    rows = bm25_retrieval(_docs(spark), probe_ids=(0, 7, 42),
                          n_query_terms=3, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_doc, []).append(r)
    assert set(by_q) == {0, 7, 42}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) == 5
        # probe excluded; scores non-increasing with doc_id tie-break
        assert all(r.doc_id != q for r in rs)
        for a, b in zip(rs, rs[1:]):
            assert (a.score_milli, -a.doc_id) >= (b.score_milli, -b.doc_id)
            if a.score_milli == b.score_milli:
                assert a.doc_id < b.doc_id


def test_bm25_query_table_broadcasts(spark):
    from rel_db_to_graph_spark.operators.stats import bm25_retrieval
    p = plan_of(bm25_retrieval(_docs(spark)))
    # the probe join must be the broadcast form — a corpus shuffle on
    # `term` for a 9-row query table would be the wrong plan at 100 TB
    assert "BroadcastHashJoin" in p


def test_bm25_self_retrieval_sanity(spark):
    # a probe's own keywords should pull back docs sharing those terms:
    # every hit must contain at least one query term
    from rel_db_to_graph_spark.operators.stats import bm25_retrieval
    from rel_db_to_graph_spark.operators.stats import tfidf_keywords
    docs = _docs(spark)
    hits = bm25_retrieval(docs, probe_ids=(0,), n_query_terms=3,
                          k=5).collect()
    qterms = {r.term for r in tfidf_keywords(docs, k=3).collect()
              if r.doc_id == 0}
    texts = {r.doc_id: r.text for r in docs.filter(
        F.col("doc_id").isin([h.doc_id for h in hits])).collect()}
    for h in hits:
        toks = set(texts[h.doc_id].lower().split())
        assert toks & qterms, (h.doc_id, qterms)
