"""N-gram language-model scoring — the CCNet-style quality signal: train
a bigram LM on the corpus, score every document by its negative
log-likelihood, and filter the tail (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020 —
their filter is a KenLM 5-gram; the bigram version keeps the identical
dataflow with tractable state).

Dataflow (both halves one-shuffle shapes):
  * TRAIN: explode per-doc adjacent word pairs → one groupBy(a, b)
    for bigram counts; unigram counts and the vocabulary size V are a
    second aggregation over the same exploded frame. Add-one smoothing:
    p(b|a) = (c(ab)+1) / (c(a)+V).
  * SCORE: re-explode each doc's bigrams, LEFT-join the bigram table
    (misses score as unseen: c_ab=0), decimal-sum the per-bigram
    round(-ln p, 6) terms per doc. At 100 TB the bigram table is
    vocabulary-bounded (shuffle-join on the bigram key, or broadcast
    when the vocab is small); documents shuffle only their (bigram,
    doc_id) pairs.

Determinism/parity: each per-bigram term is rounded to 6 dp BEFORE the
per-doc sum, and the sum runs in DECIMAL — order-independent, so the
result is bit-stable on any partitioning and hash-matches the DuckDB
twin (the ln itself is the same double in both engines for all but
boundary-of-rounding inputs; the 6 dp quantization is the established
exp/sigmoid-oracle convention of this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.text import normalize, tokens


def _doc_bigrams(docs: DataFrame, text_col: str,
                 id_col: str) -> DataFrame:
    """(doc_id, a, b) — per-position adjacent word pairs."""
    toks = (docs.select(F.col(id_col),
                        tokens(normalize(F.col(text_col))).alias("_t"))
            .select(id_col, F.filter("_t", lambda t: t != "").alias("_t"))
            .filter(F.size("_t") >= 2))
    pair = F.explode(F.arrays_zip(
        F.slice("_t", 1, F.size("_t") - 1).alias("a"),
        F.slice("_t", 2, F.size("_t") - 1).alias("b")))
    return (toks.select(F.col(id_col), pair.alias("p"))
            .select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b")))


def bigram_counts(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> tuple[DataFrame, DataFrame, int]:
    """(bigram table (a, b, c_ab), unigram table (a, c_a), V)."""
    bg = _doc_bigrams(docs, text_col, id_col)
    bigrams = bg.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    unigrams = bg.groupBy("a").agg(F.count("*").alias("c_a"))
    toks = (docs.select(F.explode(tokens(normalize(F.col(text_col))))
                        .alias("t")).filter(F.col("t") != ""))
    v = toks.distinct().count()
    return bigrams, unigrams, v


def doc_nll(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, nll): per-document add-one-smoothed bigram
    negative log-likelihood — nll = Σ round(-ln((c_ab+1)/(c_a+V)), 6),
    decimal-summed. High nll/n_bigrams = far from the corpus LM = the
    CCNet tail-filter signal."""
    bigrams, unigrams, v = bigram_counts(docs, text_col, id_col)
    bg = _doc_bigrams(docs, text_col, id_col)
    joined = (bg.join(bigrams, ["a", "b"], "left")
              .join(unigrams, "a")
              .select(F.col(id_col),
                      F.coalesce(F.col("c_ab"), F.lit(0)).alias("c_ab"),
                      "c_a"))
    term = F.round(
        -F.log((F.col("c_ab") + 1).cast("double")
               / (F.col("c_a") + F.lit(int(v))).cast("double")), 6)
    return (joined.select(F.col(id_col), term.alias("t"))
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.sum(F.col("t").cast("decimal(27,6)")).cast("double")
                 .alias("nll")))
