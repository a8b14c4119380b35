"""Deterministic sampling operators — partition invariance, append
stability, stratified rates, and the TakeOrdered (no total sort) plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.sample import (
    sample_topk,
    stratified_sample,
    uniform_sample,
)
from tests.test_plans import plan_of


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"))


def test_uniform_sample_rate_and_determinism(spark):
    d = _docs(spark)
    s1 = {r.doc_id for r in uniform_sample(d, 0.3, "doc_id", seed=1).collect()}
    s2 = {r.doc_id for r in
          uniform_sample(d.repartition(16), 0.3, "doc_id", seed=1).collect()}
    assert s1 == s2                      # partition-invariant
    assert 0.2 < len(s1) / 2000 < 0.4    # ~rate (md5 is uniform)
    # different seed -> different sample
    s3 = {r.doc_id for r in uniform_sample(d, 0.3, "doc_id", seed=2).collect()}
    assert s1 != s3


def test_uniform_sample_append_stable(spark):
    small = {r.doc_id for r in
             uniform_sample(_docs(spark, 1000), 0.3, "doc_id", seed=1).collect()}
    big = {r.doc_id for r in
           uniform_sample(_docs(spark, 2000), 0.3, "doc_id", seed=1).collect()}
    assert small == {i for i in big if i < 1000}


def test_stratified_rates_respected(spark):
    d = _docs(spark)          # 500 en, 1500 de
    s = stratified_sample(d, "lang", {"en": 1.0, "de": 0.2}, "doc_id")
    by_lang = {r.lang: r.n for r in
               s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == 500                 # rate 1.0 keeps all
    assert 150 < by_lang["de"] < 450            # ~0.2 of 1500


def test_stratified_default_rate_zero_drops_unknown(spark):
    d = _docs(spark)
    s = stratified_sample(d, "lang", {"en": 1.0}, "doc_id", default_rate=0.0)
    assert {r.lang for r in s.select("lang").distinct().collect()} == {"en"}


def test_sample_topk_exact_k_and_stable(spark):
    d = _docs(spark)
    t1 = [r.doc_id for r in sample_topk(d, 25, "doc_id", seed=3).collect()]
    t2 = [r.doc_id for r in
          sample_topk(d.repartition(16), 25, "doc_id", seed=3).collect()]
    assert len(t1) == 25 and t1 == t2


def test_sample_topk_plan_is_take_ordered(spark):
    p = plan_of(sample_topk(_docs(spark), 25, "doc_id"))
    assert "TakeOrderedAndProject" in p


def test_map_only_no_shuffle(spark):
    p = plan_of(uniform_sample(_docs(spark), 0.5, "doc_id"))
    assert "Exchange" not in p


def test_stratified_subset_of_uniform_hypothesis(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rate=st.floats(min_value=0.05, max_value=0.95),
           seed=st.integers(min_value=0, max_value=50))
    def check(rate, seed):
        d = _docs(spark, 400)
        u = {r.doc_id for r in uniform_sample(d, rate, "doc_id", seed).collect()}
        # stratified with every stratum at `rate` == uniform at `rate`
        s = {r.doc_id for r in stratified_sample(
            d, "lang", {"en": rate, "de": rate}, "doc_id", seed=seed).collect()}
        assert u == s
        # monotone: lowering the rate only removes rows
        lo = {r.doc_id for r in
              uniform_sample(d, rate / 2, "doc_id", seed).collect()}
        assert lo <= u

    check()


def test_group_quota_cap_and_determinism(spark):
    from rel_db_to_graph_spark.operators.sample import group_quota

    d = _docs(spark)  # lang en: 500 rows, de: 1500 rows
    capped = group_quota(d, "lang", cap=100, key_col="doc_id", seed=5)
    sizes = {r.lang: r.n for r in
             capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"en": 100, "de": 100}
    # partition-invariant pick (content-addressed draw)
    again = group_quota(d.repartition(16), "lang", cap=100,
                        key_col="doc_id", seed=5)
    assert {r.doc_id for r in capped.collect()} == \
           {r.doc_id for r in again.collect()}
    # a cap above the group size keeps everything
    assert group_quota(d, "lang", cap=5000, key_col="doc_id",
                       seed=5).count() == d.count()
