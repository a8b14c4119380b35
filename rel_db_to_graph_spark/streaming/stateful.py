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

OUTPUT_SCHEMA = ("user_id long, n_events long, n_sessions long, "
                 "last_ts long")
STATE_SCHEMA = "n_events long, n_sessions long, last_ts long"

SESSION_GAP_NS = 1800 * 1_000_000_000


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterable[pd.DataFrame]:
    # self-contained: runs on workers with no package on sys.path
    n_events, n_sessions, last_ts = (
        state.get if state.exists else (0, 0, None))
    for pdf in pdfs:
        for ts in sorted(int(t) for t in pdf["ts"]):
            if last_ts is None or ts - last_ts > 1800 * 1_000_000_000:
                n_sessions += 1
            n_events += 1
            last_ts = ts
    state.update((n_events, n_sessions, last_ts))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n_events],
                        "n_sessions": [n_sessions], "last_ts": [last_ts]})


def running_user_sessions(events_stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, n_sessions, last_ts) across batches."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
