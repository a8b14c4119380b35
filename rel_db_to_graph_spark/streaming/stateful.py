"""Custom stateful streaming operator via applyInPandasWithState.

The streaming twin of sessionization: per-user running state (event
count, last-seen timestamp, session counter) maintained across
micro-batches. This is the `applyInPandasWithState` pattern the
north-star asks for — arbitrary per-key state the built-in window
aggregates can't express.

State scale: one row of state per user key, hash-partitioned — the
state store shards with the cluster exactly like a shuffle. With the
default NoTimeout the state is bounded by KEY CARDINALITY (one row per
user ever seen — fine for bounded key spaces, measured flat at 150k
keys in the sf10 probe, BASELINE.md round 10); for unbounded key
spaces pass ``idle_timeout_minutes`` to evict keys idle past the
event-time watermark + timeout (round 10): a timed-out user's final
row is emitted once more and the state row is REMOVED — a user
reappearing later starts a fresh count, the standard
production state/exactness trade-off, documented rather than hidden.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# last_ts is µs since epoch — matches the batch sessionize domain
OUTPUT_SCHEMA = ("user_id long, n_events long, n_sessions long, "
                 "last_ts long")
STATE_SCHEMA = "n_events long, n_sessions long, last_ts long"

SESSION_GAP_US = 1800 * 1_000_000


def _update_fn(idle_timeout_ms: int | None = None):
    """Factory for the per-key state-update closure: the returned
    function is a closure product, so cloudpickle serializes it BY
    VALUE — a module-level function would pickle by REFERENCE to this
    module, which workers cannot import when the driver loads
    __spark_entry__.py by file path (the round-6 mapInPandas lesson,
    re-learned here when stream_variants entered the driver gate).

    ``idle_timeout_ms`` (round 10): when set, the caller runs with
    EventTimeTimeout — a key idle past watermark + timeout is handed
    back with ``state.hasTimedOut``; its final row is emitted and the
    state row removed (bounded state for unbounded key spaces)."""
    def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        # self-contained: runs on workers with no package on sys.path
        import numpy as np
        import pandas as pd

        gap_us = 1800 * 1_000_000

        if idle_timeout_ms is not None and state.hasTimedOut:
            # eviction path: emit the key's final totals once, drop
            # the state row (state size ← active keys, not |keys ever|)
            n_events, n_sessions, last_ts = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]],
                                "n_events": [n_events],
                                "n_sessions": [n_sessions],
                                "last_ts": [last_ts]})
            return

        def ts_us(series):
            # datetime64[any-unit] -> µs ints; legacy int64-ns -> µs
            # ints. Explicit unit normalization: to_numpy(int64) alone
            # would yield whatever unit pandas stored (ns vs µs varies
            # by version).
            if series.dtype.kind == "M":
                return series.to_numpy("datetime64[us]").astype("int64")
            return series.to_numpy(dtype="int64") // 1000

        n_events, n_sessions, last_ts = (
            state.get if state.exists else (0, 0, None))
        chunks = [ts_us(pdf["ts"]) for pdf in pdfs]
        ts_all = (np.sort(np.concatenate(chunks)) if chunks
                  else np.empty(0, dtype="int64"))
        if ts_all.size:
            # vectorized gap detection: a session starts at the first
            # event (when no prior state) and wherever the gap to the
            # previous event exceeds the threshold — numpy diff, no
            # per-event loop
            gaps = np.diff(ts_all)
            n_sessions += int((gaps > gap_us).sum())
            if last_ts is None:
                n_sessions += 1
            elif ts_all[0] - last_ts > gap_us:
                n_sessions += 1
            n_events += int(ts_all.size)
            last_ts = int(ts_all[-1])
        state.update((n_events, n_sessions, last_ts))
        if idle_timeout_ms is not None and last_ts is not None:
            # event-time timeout must sit ABOVE the current watermark
            # (Spark rejects a timestamp at/below it — a key whose last
            # event already lags the watermark by more than the timeout
            # would otherwise fail the batch); clamping schedules those
            # keys for eviction at the next watermark advance
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_ts // 1000 + idle_timeout_ms, wm + 1))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n_events],
                            "n_sessions": [n_sessions],
                            "last_ts": [last_ts]})
    return _update


def running_user_sessions(events_stream: DataFrame,
                          idle_timeout_minutes: int | None = None,
                          watermark: str = "2 hours") -> DataFrame:
    """Per-user running (n_events, n_sessions, last_ts) across batches.

    ``idle_timeout_minutes=None`` (default, the registry/gated shape):
    NoTimeout — exact running totals forever, state = one row per key
    ever seen. With a value: EventTimeTimeout against ``watermark`` —
    keys idle past watermark + timeout emit a final row and are
    EVICTED (state = active keys only; a returning key restarts its
    counts). The sf10 probe (BASELINE.md round 10) measures both
    regimes."""
    if idle_timeout_minutes is None:
        return (
            events_stream.groupBy("user_id")
            .applyInPandasWithState(
                _update_fn(),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    return (
        events_stream.withWatermark("event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_fn(idle_timeout_ms=idle_timeout_minutes * 60_000),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_windows_stream(events_stream: DataFrame,
                           gap: str = "30 minutes",
                           watermark: str = "2 hours") -> DataFrame:
    """Session-LEVEL streaming sessionization on the BUILT-IN
    ``F.session_window`` — the PRODUCTION throughput path (round 11,
    VERDICT r10 missing #2): merging, state, and eviction run entirely
    JVM-side against the watermark, with none of the per-key Python
    dispatch that caps applyInPandasWithState at ~57k events/s on the
    sf10 feed (measured ~10× slower than the built-in shapes —
    BASELINE.md round 10; the per-KEY callback fan-out is the cost, the
    per-event numpy math inside it was already vectorized).

    Output: one row per closed (user, session) — (user_id,
    session_start, session_end, n_events); append mode emits a session
    once the watermark passes its end. The custom
    ``running_user_sessions`` stays as the flexibility tier for
    per-user RUNNING totals across sessions, which no built-in
    aggregate expresses.

    Boundary note (pinned by tests/test_streaming.py): session_window
    MERGES events exactly ``gap`` apart — a new session starts only on
    a strictly-greater gap, the same boundary rule as the custom
    kernel and the batch lag-gap twin, so all three sessionizers
    agree event-for-event."""
    return (events_stream.withWatermark("event_time", watermark)
            .groupBy("user_id", F.session_window("event_time", gap))
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events"))
