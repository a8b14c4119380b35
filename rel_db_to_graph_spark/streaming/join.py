"""Stream-stream interval join — the last member of the streaming
operator family (windowed agg, dedup, stateful sessions, stream-static
enrich, sketch all exist; this adds two UNBOUNDED sides).

Shape: purchases ⋈ clicks on user within (p_time - 10 min, p_time] —
the streaming twin of the batch attribution range-join
(operators/events.py::range_join, queries.q_events_attribution).

Watermark math (what bounds the state): both sides carry a 2 h
watermark, and the join condition gives Spark an upper AND lower bound
on how long a row can still find a partner: a click can only match
purchases up to 10 min after it, so click state older than
watermark + 10 min is evicted; purchases evict at the watermark. State
is O(rows within the watermark horizon), not O(stream) — the property
that makes the join runnable forever. Without the time-range predicate
Spark would have to keep BOTH sides' full history (and warns so);
always constrain stream-stream joins with event-time bounds.

At 100 TB-scale streaming: both sides shuffle on user_id (the equi-key)
— same co-partitioning story as the batch join; the interval predicate
is evaluated post-shuffle per key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "interval 10 minutes"


def attribution_pairs_stream(events_stream: DataFrame) -> DataFrame:
    """(purchase_event_id, click_event_id, user_id, gap_us) for every
    click within 10 minutes before (or at) a purchase by the same user.
    ``events_stream`` is read_events_stream output (has event_time)."""
    purchases = (events_stream.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_event_id"),
                         F.col("user_id").alias("p_user"),
                         F.col("event_time").alias("p_time"))
                 .withWatermark("p_time", "2 hours"))
    clicks = (events_stream.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_event_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("event_time").alias("c_time"))
              .withWatermark("c_time", "2 hours"))
    joined = purchases.join(
        clicks,
        F.expr(f"""
            p_user = c_user
            AND c_time > p_time - {ATTRIBUTION_WINDOW}
            AND c_time <= p_time
        """),
        "inner")
    return joined.select(
        "purchase_event_id", "click_event_id",
        F.col("p_user").alias("user_id"),
        (F.unix_micros("p_time") - F.unix_micros("c_time")).alias("gap_us"))
