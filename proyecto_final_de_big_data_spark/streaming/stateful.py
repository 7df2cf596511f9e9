"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user running profile (event count, running mean value, last-seen
timestamp) maintained across micro-batches with processing-time timeout
eviction.

This is the escape hatch for stateful logic that windowed aggregation
can't express (cross-window running state, custom eviction). State is
per-key and Arrow-batched — the 100-TB-stream consideration is state
SIZE per key (a handful of scalars here) and timeout-based eviction so
the store doesn't grow with cardinality of dead keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, mean_value double, last_seen timestamp"
STATE_SCHEMA = "n long, total double, last_seen timestamp"


def _update_user_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last_seen = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
    state.update((n, total, last_seen))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "mean_value": [total / n if n else 0.0],
            "last_seen": [last_seen],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events (streaming) → per-user running profile updates."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
