"""Stream-static enrichment — the lookup-join every event pipeline runs:
an unbounded event stream joined to a bounded dimension snapshot
(user → account attributes here; at production scale, user profiles,
device registries, geo tables).

Structured Streaming executes a stream-static equi-join by re-reading /
broadcasting the STATIC side into each micro-batch — no streaming state
at all (nothing to watermark, nothing to evict), which is why this
pattern scales to arbitrarily long-running jobs: per-batch cost is the
batch's events × one hash-join against the dim. The static side should
be broadcast-sized (or pre-bucketed on the key) — exactly the same rule
as the batch `broadcast(dim)` join.

The aggregated twin (`enriched_rates_stream`) shows the composed shape:
enrich → event-time window per dimension attribute — the per-segment
throughput dashboards run exactly this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events_stream(events_stream: DataFrame,
                         dim: DataFrame,
                         on: str = "user_id") -> DataFrame:
    """Attach static dimension columns to each streaming event.
    ``dim`` must be a static (batch) DataFrame keyed by ``on``; the
    broadcast hint pins the scale-correct plan for a small dim."""
    return events_stream.join(F.broadcast(dim), on, "left")


def enriched_rates_stream(events_stream: DataFrame, dim: DataFrame,
                          attr: str, on: str = "user_id") -> DataFrame:
    """Hourly event counts per dimension attribute (e.g. per nation):
    stream-static enrich, then watermarked tumbling window."""
    enriched = enrich_events_stream(events_stream, dim, on)
    return (enriched
            .withWatermark("event_time", "2 hours")
            .groupBy(F.window("event_time", "1 hour").alias("w"),
                     F.col(attr))
            .agg(F.count("*").alias("n_events"))
            .select(F.date_format(F.col("w.start"),
                                  "yyyy-MM-dd HH:mm:ss").alias("hour"),
                    attr, "n_events"))
