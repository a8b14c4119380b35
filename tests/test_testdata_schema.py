"""Pin the physical dtypes of the driver-generated testdata that the
operator families assume. The round-3 ts bug (`timestamp[us]` read under
a declared `bigint` schema → silent cast to SECONDS, five wrong-answer
queries) entered exactly because nothing asserted what the parquet
actually stores: unit tests used synthetic frames and only oracle parity
read the real files. If the driver regenerates testdata with different
types, fail HERE, loudly, not in five downstream hash mismatches."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from rel_db_to_graph_spark.sources.catalog import TABLE_SCHEMAS, load_table
from tests.conftest import SF_SMOKE


def test_events_ts_is_native_timestamp():
    """The single most load-bearing assumption: events.ts is a parquet
    timestamp (µs). Everything in operators/events.py + the event
    queries does its math via unix_micros on that premise."""
    field = pq.read_schema(f"{SF_SMOKE}/events.parquet").field("ts")
    assert str(field.type).startswith("timestamp"), (
        f"events.ts regenerated as {field.type}; "
        "update TABLE_SCHEMAS + operators/events.py::ts_micros")


@pytest.mark.parametrize("table", sorted(TABLE_SCHEMAS))
def test_declared_schema_matches_parquet(spark, table):
    """Every declared TABLE_SCHEMAS entry must match what Spark infers
    from the actual files — a declared schema that diverges coerces
    silently (that's how timestamp->bigint became seconds)."""
    def norm(dtypes):
        # timestamp_ntz == timestamp here: session TZ is pinned UTC
        # (session.py), so wall-clock and instant semantics coincide —
        # the dangerous coercions (timestamp<->numeric) still fail
        return {c: ("timestamp" if t == "timestamp_ntz" else t)
                for c, t in dtypes}

    declared = norm(load_table(spark, SF_SMOKE, table).dtypes)
    inferred = norm(
        spark.read.parquet(f"{SF_SMOKE}/{table}.parquet").dtypes)
    assert declared == inferred, (
        f"{table}: declared {declared} != parquet {inferred}")
