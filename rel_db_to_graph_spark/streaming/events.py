"""Structured Streaming over the events table.

The batch twins live in operators/events.py; these are the streaming
shapes a production pipeline runs: readStream → event-time window with
watermark → sink. Tests drive them with ``trigger(availableNow=True)``
against the static parquet so results are comparable to the batch oracle.

Watermark math: the testdata ts column is a native timestamp[us]; we
alias it to event_time and allow 2 hours of lateness — late rows inside
the watermark update their window (update mode) or are held until the
watermark passes (append mode).

At scale: the windowed aggregate keeps state per (window, event_type) —
cardinality-bounded state, safe for long-running jobs; the watermark
bounds state eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the static events parquet (one file = one
    micro-batch under availableNow; in production this is a kafka/delta
    source with the same downstream plan)."""
    from rel_db_to_graph_spark.sources.catalog import ensure_session_confs
    ensure_session_confs(spark)
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
        .withColumn("event_time", F.col("ts"))
    )


def hourly_counts_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1h window per event_type with a 2h watermark."""
    return (
        events.withWatermark("event_time", "2 hours")
        .groupBy(F.window("event_time", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
             .alias("sum_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
                "event_type", "n_events", "sum_value")
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> None:
    """Drain the stream into an in-memory table named ``query_name``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
