"""Custom stateful streaming operator via applyInPandasWithState.

The streaming twin of sessionization: per-user running state (event
count, last-seen timestamp, session counter) maintained across
micro-batches with a processing-time timeout. This is the
`applyInPandasWithState` pattern the north-star asks for — arbitrary
per-key state the built-in window aggregates can't express.

State scale: one row of state per user key, hash-partitioned — the
state store shards with the cluster exactly like a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# last_ts is µs since epoch — matches the batch sessionize domain
OUTPUT_SCHEMA = ("user_id long, n_events long, n_sessions long, "
                 "last_ts long")
STATE_SCHEMA = "n_events long, n_sessions long, last_ts long"

SESSION_GAP_US = 1800 * 1_000_000


def _update_fn():
    """Factory for the per-key state-update closure: the returned
    function is a closure product, so cloudpickle serializes it BY
    VALUE — a module-level function would pickle by REFERENCE to this
    module, which workers cannot import when the driver loads
    __spark_entry__.py by file path (the round-6 mapInPandas lesson,
    re-learned here when stream_variants entered the driver gate)."""
    def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        # self-contained: runs on workers with no package on sys.path
        import numpy as np
        import pandas as pd

        gap_us = 1800 * 1_000_000

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
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n_events],
                            "n_sessions": [n_sessions],
                            "last_ts": [last_ts]})
    return _update


def running_user_sessions(events_stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, n_sessions, last_ts) across batches."""
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
