"""Hypothesis property tests over arbitrary inputs (not just the fixture
data), plus partition-variance robustness: oracle-checked aggregates must
be bit-identical whatever the shuffle partitioning."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.dedup import jaccard
from rel_db_to_graph_spark.operators.graph_build import dense_ids, dense_ids_scalable
from rel_db_to_graph_spark.operators.split import hash_split

_settings = settings(max_examples=8, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(pks=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                    min_size=1, max_size=60, unique=True))
@_settings
def test_dense_ids_always_dense(spark, pks):
    df = spark.createDataFrame([(p,) for p in pks], "pk_col long")
    out = {r.pk: r.node_id for r in dense_ids(df, "pk_col").collect()}
    assert sorted(out.values()) == list(range(len(pks)))
    # sorted semantics: rank order matches pk order
    assert [p for p, _ in sorted(out.items())] == sorted(pks)


@given(pks=st.lists(st.integers(min_value=0, max_value=10**6),
                    min_size=1, max_size=60, unique=True),
       buckets=st.integers(min_value=1, max_value=8))
@_settings
def test_scalable_ids_always_dense(spark, pks, buckets):
    df = spark.createDataFrame([(p,) for p in pks], "pk_col long")
    out = [r.node_id for r in
           dense_ids_scalable(df, "pk_col", num_buckets=buckets).collect()]
    assert sorted(out) == list(range(len(pks)))


@given(a=st.lists(st.text(alphabet="abc", min_size=1, max_size=3),
                  min_size=1, max_size=20),
       b=st.lists(st.text(alphabet="abc", min_size=1, max_size=3),
                  min_size=1, max_size=20))
@_settings
def test_jaccard_bounds(spark, a, b):
    df = spark.createDataFrame([(list(set(a)), list(set(b)))],
                               "sa array<string>, sb array<string>")
    j = df.select(jaccard(F.col("sa"), F.col("sb")).alias("j")).collect()[0].j
    assert 0.0 <= j <= 1.0
    if set(a) == set(b):
        assert j == 1.0
    if not set(a) & set(b):
        assert j == 0.0


@given(n=st.integers(min_value=10, max_value=300),
       seed=st.integers(min_value=0, max_value=1000))
@_settings
def test_split_exhaustive_any_input(spark, n, seed):
    e = spark.range(n).select(F.col("id").alias("src"),
                              (F.col("id") * 7 % 13).alias("dst"))
    tagged = hash_split(e, val_frac=0.2, seed=seed)
    counts = {r.split: r.c for r in
              tagged.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == n
    assert set(counts) <= {"train", "val", "test"}


def test_md5_draw_variants_share_the_sampling_shape(spark):
    """The md5 draw (registry/oracle path) and the default xxhash64
    draw (trainer path) must be interchangeable in every respect
    except WHICH pseudo-random elements are drawn: same split
    exhaustiveness, identical per-src sampled-edge counts
    (min(degree, fanout) is draw-independent), and identical
    negative-set size per positive row before collision rejection."""
    from rel_db_to_graph_spark.operators.sampling import (
        negative_sample,
        sample_neighbors,
    )

    e = spark.range(200).select(
        (F.col("id") % 40).alias("src"), (F.col("id") * 7 % 23).alias("dst"),
    ).distinct()
    # split: both draws tag every row with a valid tier
    for draw in ("xxhash64", "md5"):
        tagged = hash_split(e, val_frac=0.2, draw=draw)
        counts = {r.split: r.c for r in
                  tagged.groupBy("split").agg(F.count("*").alias("c"))
                  .collect()}
        assert sum(counts.values()) == e.count()
        assert set(counts) <= {"train", "val", "test"}
    # neighbor sampling: per-src counts are draw-independent, and each
    # draw's sampled set is a subset of the true edge set
    frontier = e.select("src").distinct()
    per_src = {}
    for draw in ("xxhash64", "md5"):
        s = sample_neighbors(e, frontier, fanout=3, draw=draw)
        assert s.join(e, ["src", "dst"], "left_anti").count() == 0
        per_src[draw] = {r.src: r.c for r in
                         s.groupBy("src").agg(F.count("*").alias("c"))
                         .collect()}
    assert per_src["md5"] == per_src["xxhash64"]
    # negative sampling: one corrupt draw per positive, both draws
    nodes = spark.range(23).select(F.col("id").alias("node_id"))
    for draw in ("xxhash64", "md5"):
        labeled = negative_sample(e, nodes, ratio=1, draw=draw)
        n_pos = labeled.filter("label = 1").count()
        assert n_pos == e.count()
        assert labeled.filter("label = 0").count() <= n_pos


def test_aggregates_partition_invariant(spark):
    """The decimal-sum discipline: identical results at any partitioning."""
    from rel_db_to_graph_spark.queries import q_pricing_summary
    base = q_pricing_summary(spark, "/root/testdata/sf0.01")
    rows = {tuple(sorted(r.asDict().items())) for r in base.collect()}
    for parts in (1, 7, 64):
        li = (spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
              .repartition(parts))
        li.createOrReplaceTempView("_li_tmp")
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc * (1 + F.col("l_tax"))
        redo = (
            li.filter(F.col("l_shipdate") <=
                      F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double").alias("sum_base_price"),
                 F.sum(disc.cast("decimal(27,6)")).cast("double").alias("sum_disc_price"),
                 F.sum(charge.cast("decimal(27,6)")).cast("double").alias("sum_charge"),
                 F.count("*").alias("count_order"))
            .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
            .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        )
        got = {tuple(sorted(r.asDict().items())) for r in redo.collect()}
        assert got == rows, f"partitioning {parts} changed aggregate bits"


@given(counts=st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    st.integers(min_value=1, max_value=10**9),
    min_size=1, max_size=12))
@_settings
def test_temperature_weights_properties(counts):
    from math import ceil, sqrt

    from rel_db_to_graph_spark.operators.mix import temperature_weights
    w = temperature_weights(counts, tau=0.5, quant=100)
    assert set(w) == set(counts)
    assert all(isinstance(v, int) and 1 <= v <= 100 for v in w.values())
    # the largest source always gets the full quant
    biggest = max(counts, key=lambda s: (counts[s], s))
    assert w[biggest] == 100
    # monotone: more docs -> weight never smaller
    for a in counts:
        for b in counts:
            if counts[a] <= counts[b]:
                assert w[a] <= w[b]
    # exact formula (IEEE sqrt + ceil)
    mx = max(counts.values())
    for s, n in counts.items():
        assert w[s] == int(ceil(100 * sqrt(n / mx)))


@given(pks=st.lists(st.integers(min_value=0, max_value=10**6),
                    min_size=2, max_size=40, unique=True),
       cut=st.integers(min_value=1, max_value=39))
@_settings
def test_incremental_ids_stable_for_any_split(spark, pks, cut):
    """Whatever prefix of the key set forms the snapshot, appending the
    rest never moves an old id and the union stays dense."""
    from rel_db_to_graph_spark.operators.graph_build import dense_ids_scalable
    from rel_db_to_graph_spark.operators.increment import dense_ids_append
    cut = min(cut, len(pks) - 1)
    old_keys, all_keys = pks[:cut], pks
    old = dense_ids_scalable(
        spark.createDataFrame([(p,) for p in old_keys], "pk long"), "pk")
    merged = dense_ids_append(
        old, spark.createDataFrame([(p,) for p in all_keys], "pk long"),
        "pk")
    got = {r.pk: r.node_id for r in merged.collect()}
    before = {r.pk: r.node_id for r in old.collect()}
    assert all(got[p] == i for p, i in before.items())
    assert sorted(got.values()) == list(range(len(all_keys)))
