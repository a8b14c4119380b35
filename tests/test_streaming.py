"""Structured Streaming parity: the availableNow-drained stream must agree
with the batch rollup on (hour, event_type) counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.events import hourly_rollup
from rel_db_to_graph_spark.sources.catalog import load_table
from rel_db_to_graph_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_available_now,
)
from tests.conftest import SF_SMOKE


def test_stream_matches_batch(spark):
    stream = hourly_counts_stream(read_events_stream(spark, SF_SMOKE))
    run_available_now(stream, "hourly_stream_test")
    streamed = spark.table("hourly_stream_test")

    batch = hourly_rollup(load_table(spark, SF_SMOKE, "events")).select(
        "hour", "event_type", "n_events", "sum_value")

    assert streamed.count() == batch.count()
    diff = (streamed.select("hour", "event_type", "n_events", "sum_value")
            .exceptAll(batch))
    assert diff.count() == 0


def test_watermark_present(spark):
    stream = hourly_counts_stream(read_events_stream(spark, SF_SMOKE))
    assert stream.isStreaming
