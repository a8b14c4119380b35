"""Dataset mixing — deterministic weighted interleave of corpus sources
into one training stream (web:wiki:books at 3:2:1, say), the step that
fixes each epoch's data order in an LLM pretraining pipeline.

Algorithm: STRIDE SCHEDULING (the classic weighted-fair-queueing
discipline), done entirely in integers so it is exact, reproducible,
and oracle-checkable:

  * each source s gets an integer weight w_s; L = lcm(weights);
    stride_s = L / w_s;
  * the i-th document of source s (per-source ordinal i, dense 0..N-1)
    gets pass value i * stride_s;
  * the stream is ordered by (pass, source, ordinal) — a total,
    integer-valued order in which any prefix contains sources in
    proportion to their weights (±1 round).

Scale shape: per-source ordinals reuse the bucketed no-total-sort rank
(dense_ids_scalable pattern, partitioned by (source, md5-bucket); the
offsets branch is |sources|×num_buckets rows). The pass/stride columns
are map-only arithmetic. Consumers either write the stream partitioned
by pass-range or take a prefix via TakeOrdered — nothing here performs
a global sort of the data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.graph_build import (
    DEFAULT_ID_BUCKETS,
    hash_bucket,
)


def source_ordinals(df: DataFrame, source_col: str, key_col: str,
                    num_buckets: int = DEFAULT_ID_BUCKETS) -> DataFrame:
    """(key, source, ordinal): dense per-source 0..N_s-1 ordinals in
    canonical (md5-bucket, key) order — one shuffle on (source, bucket),
    no total sort, exchange-reused offsets branch."""
    base = df.select(F.col(key_col).alias("key"),
                     F.col(source_col).alias("source"))
    bucketed = base.withColumn("_b", hash_bucket(F.col("key"), num_buckets))
    w_rank = Window.partitionBy("source", "_b").orderBy("key")
    w_bucket = Window.partitionBy("source", "_b")
    ranked = (bucketed
              .withColumn("_rk", F.row_number().over(w_rank))
              .withColumn("_n", F.count("*").over(w_bucket)))
    w_off = (Window.partitionBy("source").orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (ranked.filter(F.col("_rk") == 1).select("source", "_b", "_n")
               .select("source", "_b",
                       F.coalesce(F.sum("_n").over(w_off), F.lit(0))
                       .alias("_off")))
    return (ranked.join(F.broadcast(offsets), ["source", "_b"])
            .select("key", "source",
                    (F.col("_off") + F.col("_rk") - 1).cast("long")
                    .alias("ordinal")))


def corpus_mix(df: DataFrame, source_col: str, weights: dict[str, int],
               key_col: str, default_weight: int = 1) -> DataFrame:
    """(key, source, ordinal, pass) — the stride-scheduled stream order.
    Sources absent from ``weights`` get ``default_weight``; weights must
    be positive integers. Sort consumers by (pass, source, ordinal)."""
    if any(w <= 0 or w != int(w) for w in weights.values()):
        raise ValueError(f"weights must be positive integers: {weights}")
    l = math.lcm(default_weight, *[int(w) for w in weights.values()])
    stride = F.lit(int(l // default_weight))
    for s, w in sorted(weights.items()):
        stride = F.when(F.col("source") == s,
                        F.lit(int(l // int(w)))).otherwise(stride)
    return (source_ordinals(df, source_col, key_col)
            .withColumn("pass", (F.col("ordinal") * stride).cast("long")))


def temperature_weights(counts: dict[str, int], tau: float = 0.5,
                        quant: int = 100) -> dict[str, int]:
    """Integer source weights ∝ (n_s / max_n)^tau — the multilingual-
    balance standard (mBERT/XLM-R/T5 all sample sources by a tempered
    count power, tau<1 upsampling small sources so they aren't drowned
    by the web crawl). Quantized via ceil so every weight is a positive
    integer.

    Cross-engine exactness: for the oracle-gated tau=0.5 the power is
    ``math.sqrt`` — IEEE-754 correctly rounded, so DuckDB's ``sqrt``
    produces the SAME double, and ceil of a double is unambiguous
    (other tau values go through ``pow``, whose last ulp is libm-
    dependent — fine for production, not oracle-pinned)."""
    max_n = max(counts.values())
    out = {}
    for s, n in counts.items():
        frac = n / max_n
        p = math.sqrt(frac) if tau == 0.5 else frac ** tau
        out[s] = int(math.ceil(quant * p))
    return out


def corpus_mix_temperature(df: DataFrame, source_col: str, key_col: str,
                           tau: float = 0.5, quant: int = 100) -> DataFrame:
    """(key, source, ordinal, weight, vtime) — temperature-scaled
    weighted-fair-queueing stream order: vtime = (ordinal+1) / weight,
    the classic WFQ virtual finish time. Consumers sort by
    (vtime, source, ordinal) — a total order whose prefixes contain
    sources ∝ their tempered weights.

    vtime is a double, but EXACT for parity purposes: ordinal+1 and
    weight are small integers, and IEEE division is correctly rounded —
    both engines produce bit-identical doubles. Per-source counts come
    back as one |sources|-row collect (driver-sized); ordinals reuse
    the bucketed no-total-sort rank."""
    counts = {r[source_col]: r["n"] for r in
              df.groupBy(source_col).agg(F.count("*").alias("n")).collect()}
    weights = temperature_weights(counts, tau=tau, quant=quant)
    wcol = F.lit(None).cast("long")
    for s, w in sorted(weights.items()):
        wcol = F.when(F.col("source") == s, F.lit(int(w))).otherwise(wcol)
    return (source_ordinals(df, source_col, key_col)
            .withColumn("weight", wcol)
            .withColumn("vtime",
                        (F.col("ordinal") + 1) / F.col("weight")))


def mix_prefix(mixed: DataFrame, n: int) -> DataFrame:
    """First ``n`` stream items — TakeOrdered on the integer order, no
    total sort."""
    return mixed.orderBy("pass", "source", "ordinal").limit(int(n))
