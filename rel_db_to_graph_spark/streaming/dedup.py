"""Streaming deduplication — exact dedup as documents ARRIVE, the
incremental twin of operators/dedup.py::exact_duplicate_groups.

Two shapes, matching Structured Streaming's two state regimes:

  * ``dedup_stream`` — ``dropDuplicates`` on the content fingerprint:
    emits the FIRST occurrence of each digest, suppresses the rest.
    State = one row per distinct digest, forever; right for bounded
    digest cardinality or batch-refreshed jobs.
  * ``dedup_stream_watermarked`` — ``dropDuplicatesWithinWatermark``:
    suppresses re-occurrences within the watermark horizon, then
    EVICTS the digest. State is bounded by (arrival rate × horizon) —
    the only safe shape for an unbounded 100 TB/day feed, with the
    usual contract: duplicates farther apart than the horizon pass
    through and are caught by the nightly batch dedup (the standard
    lambda split: stream removes the near-in-time bulk, batch is
    exact).

The fingerprint is the SAME md5(normalize(text)) as the batch path, so
stream output ∪ batch dedup output agree on which doc is canonical
(first-by-arrival in stream, min-doc_id in batch — tests pin the
digest sets equal under availableNow draining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.text import fingerprint

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rel_db_to_graph_spark.sources.catalog import ensure_session_confs
    ensure_session_confs(spark)
    return (spark.readStream.schema(DOCS_SCHEMA)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))


def dedup_stream(docs: DataFrame) -> DataFrame:
    """First-wins exact dedup keyed on the content fingerprint."""
    return (docs
            .withColumn("fingerprint", fingerprint(F.col("text")))
            .dropDuplicates(["fingerprint"]))


def dedup_stream_watermarked(docs: DataFrame, ts_col: str,
                             horizon: str = "1 hour") -> DataFrame:
    """Bounded-state dedup: suppress duplicate fingerprints arriving
    within ``horizon`` of the first sighting, then forget the digest."""
    return (docs
            .withColumn("fingerprint", fingerprint(F.col("text")))
            .withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark(["fingerprint"]))
