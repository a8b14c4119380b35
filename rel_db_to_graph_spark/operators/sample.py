"""Deterministic corpus sampling — the curation step of a training-data
pipeline (downsample boilerplate strata, upweight rare languages, carve
eval holdouts) made reproducible.

Everything here is CONTENT-ADDRESSED: the draw for a row is a pure
function of (key, seed) via md5, so
  * the sample is identical on any partitioning, any cluster shape, and
    any engine (md5 is bit-identical in Spark and DuckDB → every op is
    oracle-checkable, unlike rand(seed) which is per-partition-seeded,
    or xxhash64 which DuckDB lacks);
  * re-running on a grown corpus keeps every previously-sampled row
    whose key survived — samples are append-stable, which is what you
    want for incremental 100 TB snapshots.

Scale shape: ``uniform_sample`` and ``stratified_sample`` are map-only
filters (no shuffle, no UDF — one md5 + arithmetic per row, fully
codegen'd, filter pushes to the scan's data columns). ``sample_topk``
is deterministic reservoir-style exact-k: global top-k by draw runs as
TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
never a total sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^32 — the draw divides a 32-bit integer by a power of two, so the
#: resulting double is EXACT (no rounding): Spark and DuckDB produce
#: bit-identical u values.
_DENOM = float(2**32)


def hash_draw(key: Column, seed: int = 0) -> Column:
    """u ∈ [0,1): first 8 hex chars of md5(key || '|' || seed) as a
    32-bit int, divided by 2^32. Pure function of (key, seed)."""
    digest = F.md5(F.concat_ws("|", key.cast("string"), F.lit(str(seed))))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
            / F.lit(_DENOM))


def uniform_sample(df: DataFrame, rate: float, key_col: str,
                   seed: int = 0) -> DataFrame:
    """Keep each row iff draw(key) < rate. Map-only; expected fraction
    ``rate`` with deviation O(1/sqrt(n)) — exact-size needs sample_topk."""
    return df.filter(hash_draw(F.col(key_col), seed) < F.lit(float(rate)))


def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, float],
                      key_col: str, default_rate: float = 0.0,
                      seed: int = 0) -> DataFrame:
    """Per-stratum keep rates (e.g. {'en': 0.1, 'de': 1.0}) — the corpus
    rebalancing primitive. The rate table is compiled into one CASE
    expression: no join, no broadcast, map-only at any scale. Strata
    absent from ``rates`` get ``default_rate``."""
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_draw(F.col(key_col), seed) < rate)


def group_quota(df: DataFrame, group_col: str, cap: int, key_col: str,
                seed: int = 0) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by content-addressed
    draw order (ties by key) — the per-domain/per-source cap every
    curation pipeline applies so one boilerplate-heavy host can't
    dominate the corpus. One shuffle on the group column; the per-group
    sort is local to its hash partition and row_number ≤ cap prunes
    before anything downstream (same scalable top-n shape as
    q_topn_per_group — never a per-group collect). Deterministic and
    append-stable per group for the same reasons as hash_draw.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(group_col)
         .orderBy("_draw", key_col))
    return (df.withColumn("_draw", hash_draw(F.col(key_col), seed))
            .withColumn("_qr", F.row_number().over(w))
            .filter(F.col("_qr") <= int(cap))
            .drop("_draw", "_qr"))


def sample_topk(df: DataFrame, k: int, key_col: str, seed: int = 0,
                draw_col: str = "draw") -> DataFrame:
    """Exactly-k deterministic sample: the k smallest draws (ties broken
    by key — a total order, so the pick is unique). Equivalent to a
    single-pass reservoir sample but distributed and re-runnable:
    orderBy+limit executes as TakeOrderedAndProject, k rows per
    partition -> k rows on the driver, no total sort."""
    return (df.withColumn(draw_col, hash_draw(F.col(key_col), seed))
            .orderBy(draw_col, key_col)
            .limit(int(k)))
