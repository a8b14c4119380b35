"""End-to-end integration: convert → train → recommend over the real
star-schema testdata — the reference's three entry points composed."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.dedup import doc_signatures, lsh_candidate_pairs
from rel_db_to_graph_spark.pipeline import convert, recommend, train
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE

EDGE = ("orders", "hasPart", "part")


def test_convert_train_recommend(spark):
    graph = convert(spark, SF_SMOKE)

    import math

    result = train(graph, EDGE, epochs=3)
    assert len(result.history) == 3
    # finite, sane losses every epoch (learning quality is covered by
    # test_train's separable-rule case; these features are weak signals)
    assert all(math.isfinite(h["train_loss"]) and 0 < h["train_loss"] < 2
               for h in result.history)
    assert result.best_epoch >= 0

    recs = recommend(graph, EDGE, selected_dst_ids=[0, 1, 2], k=5)
    rows = recs.collect()
    assert len(rows) == 5
    assert all(0.0 <= r.prob <= 1.0 for r in rows)
    # selected items never recommended back
    assert not {r.dst for r in rows} & {0, 1, 2}
    # deterministic
    again = recommend(graph, EDGE, selected_dst_ids=[0, 1, 2], k=5).collect()
    assert [(r.dst, r.prob) for r in rows] == [(r.dst, r.prob) for r in again]


def test_lsh_bucket_cap(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    sigs = doc_signatures(docs)
    unbounded = lsh_candidate_pairs(sigs, max_bucket=None).count()
    capped = lsh_candidate_pairs(sigs, max_bucket=2).count()
    assert capped <= unbounded
    # cap bounds worst-case fanout: no bucket contributes > C(2,2)=1 pair
    # per band, so capped pairs ≤ 4 bands × n_docs/2
    assert capped <= 4 * docs.count() // 2


def test_curation_pipeline_stage_monotone_and_capped(spark):
    """The capstone composition: each stage only removes documents,
    output respects the per-source cap, and every survivor passes every
    stage's predicate."""
    from rel_db_to_graph_spark.ml.quality import score_quality
    from rel_db_to_graph_spark.queries import q_curation_pipeline
    from tests.conftest import SF_ORACLE

    out = q_curation_pipeline(spark, SF_ORACLE).collect()
    assert out
    per_source = {}
    for r in out:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert all(n <= 10 for n in per_source.values())
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    meta = {r.doc_id: r for r in
            docs.join(score_quality(docs), "doc_id").collect()}
    for r in out:
        assert meta[r.doc_id].lang == "en"
        assert meta[r.doc_id].quality_p > 0.5
