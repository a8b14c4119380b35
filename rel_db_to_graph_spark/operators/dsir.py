"""Data Selection via Importance Resampling (DSIR) — select raw-corpus
documents that look like a target domain, by the ratio of two n-gram
language models (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023; their features are hashed
n-grams — this keeps the identical estimator over the repo's bigram LM
from operators/lm.py, which already has an exact DuckDB twin).

Estimator: log w(x) = log p_target(x) − log p_raw(x) = nll_raw(x) −
nll_target(x), with each NLL an add-one-smoothed bigram model trained
on its corpus. Selection is hash-thresholded acceptance: keep x iff
draw(doc_id) < sigmoid(logw / n_bigrams * temperature) — the
content-addressed analog of DSIR's Gumbel resampling that stays a pure
function of the data (restartable, partitioning-independent,
oracle-checkable).

Scale shape: two bigram-table trainings (one groupBy each, map-side
combined, vocabulary-bounded state) + ONE scoring pass — the doc
bigrams explode once and LEFT-join both LM tables (vocabulary-sized,
broadcast when small). At 100 TB the DSIR recipe is: train both LMs on
samples, score everything — scoring is the only full-corpus pass, and
it is map + two bounded joins + one partial-aggregated per-doc sum.

Float parity: per-bigram terms round to 6 dp before the DECIMAL
per-doc sum (the lm.py convention); the acceptance probability rounds
the sigmoid to 6 dp (the repo's established exp/sigmoid oracle
convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.lm import _doc_bigrams
from rel_db_to_graph_spark.operators.sample import hash_draw
from rel_db_to_graph_spark.operators.text import normalize, tokens


def _lm_tables(docs: DataFrame, text_col: str,
               id_col: str) -> tuple[DataFrame, DataFrame, int]:
    """(bigram (a, b, c_ab), unigram (a, c_a), V) for a training corpus."""
    bg = _doc_bigrams(docs, text_col, id_col)
    bigrams = bg.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    unigrams = bg.groupBy("a").agg(F.count("*").alias("c_a"))
    toks = (docs.select(F.explode(tokens(normalize(F.col(text_col))))
                        .alias("t")).filter(F.col("t") != ""))
    return bigrams, unigrams, toks.distinct().count()


def dsir_weights(docs: DataFrame, target: Column,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, logw): log importance weight of every doc
    with >= 1 bigram. ``target`` is a boolean Column defining the
    target domain (e.g. F.col('lang') == 'en'). Unseen tokens smooth to
    c_a = 0 (LEFT joins; p = (c_ab + 1) / (0 + V))."""
    t_big, t_uni, t_v = _lm_tables(docs.filter(target), text_col, id_col)
    r_big, r_uni, r_v = _lm_tables(docs, text_col, id_col)
    bg = _doc_bigrams(docs, text_col, id_col)
    j = (bg
         .join(t_big.withColumnsRenamed({"c_ab": "t_ab"}), ["a", "b"],
               "left")
         .join(t_uni.withColumnsRenamed({"c_a": "t_a"}), "a", "left")
         .join(r_big.withColumnsRenamed({"c_ab": "r_ab"}), ["a", "b"],
               "left")
         .join(r_uni.withColumnsRenamed({"c_a": "r_a"}), "a", "left"))

    def term(ab: str, a: str, v: int) -> Column:
        return F.round(
            -F.log((F.coalesce(F.col(ab), F.lit(0)) + 1).cast("double")
                   / (F.coalesce(F.col(a), F.lit(0)) + F.lit(int(v)))
                   .cast("double")), 6)

    logw_term = term("r_ab", "r_a", r_v) - term("t_ab", "t_a", t_v)
    return (j.select(F.col(id_col), logw_term.alias("t"))
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.sum(F.col("t").cast("decimal(27,6)")).cast("double")
                 .alias("logw")))


def dsir_select(docs: DataFrame, target: Column, temperature: float = 4.0,
                seed: int = 11, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, logw, accept_prob, selected): hash-threshold
    DSIR acceptance — keep iff draw(doc_id, seed) <
    round(sigmoid(temperature * logw / n_bigrams), 6). Per-bigram
    normalization makes the probability length-invariant; temperature
    sharpens the target preference."""
    w = dsir_weights(docs, target, text_col, id_col)
    p = F.round(
        F.lit(1.0) / (F.lit(1.0)
                      + F.exp(-F.lit(float(temperature)) * F.col("logw")
                              / F.col("n_bigrams"))), 6)
    return (w.select(id_col, "n_bigrams", "logw", p.alias("accept_prob"))
            .withColumn("selected",
                        hash_draw(F.col(id_col), seed)
                        < F.col("accept_prob")))
