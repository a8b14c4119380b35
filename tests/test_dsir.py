"""DSIR importance resampling — the selection signal must actually
prefer the target domain, and the acceptance must be content-addressed
(partitioning-independent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.dsir import dsir_select, dsir_weights
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_target_docs_score_higher(spark):
    docs = _docs(spark)
    w = (dsir_weights(docs, F.col("lang") == "en")
         .join(docs.select("doc_id", "lang"), "doc_id")
         .withColumn("per_bigram", F.col("logw") / F.col("n_bigrams")))
    means = {r["is_en"]: r["m"] for r in
             w.groupBy((F.col("lang") == "en").alias("is_en"))
              .agg(F.avg("per_bigram").alias("m")).collect()}
    assert means[True] > means[False], means


def test_selection_rate_follows_probability(spark):
    sel = dsir_select(_docs(spark), F.col("lang") == "en").cache()
    n = sel.count()
    picked = sel.filter("selected").count()
    expect = sel.agg(F.sum("accept_prob")).first()[0]
    # hash-uniform draws: observed count within 5 sigma of the sum of
    # per-doc Bernoulli means
    sigma = (expect * (1 - expect / n)) ** 0.5
    assert abs(picked - expect) < 5 * sigma + 5
    sel.unpersist()


def test_selection_partitioning_independent(spark):
    docs = _docs(spark)
    a = {tuple(r) for r in dsir_select(docs, F.col("lang") == "en").collect()}
    b = {tuple(r) for r in
         dsir_select(docs.repartition(13), F.col("lang") == "en").collect()}
    assert a == b
