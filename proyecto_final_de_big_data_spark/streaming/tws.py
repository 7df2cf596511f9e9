"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark 4 successor to ``applyInPandasWithState`` (streaming/stateful.py
keeps the classic API for comparison; new stateful operators should
start here).

What the new API buys at stream scale:

- **Typed, composable state**: named ValueState/ListState/MapState
  handles instead of one monolithic state tuple — this operator keeps a
  per-user MapState(event_type -> count) histogram, which the classic
  API could only fake by serializing the whole map into one row.
- **Explicit timers**: eviction is a registered event-time timer firing
  through ``handleExpiredTimer``, not a timeout baked into the state
  tuple — state cleanup logic is separate from update logic.
- **State TTL** (native, per-state) exists in the API as well; this
  operator uses timers because eviction must clear TWO states together.

Per-key state here is O(distinct event types for that user) — bounded
by the type vocabulary, not the event count — and the idle-eviction
timer keeps the store O(active users), the same 100-TB-stream posture
as streaming/stateful.py.

Runtime requirements: the RocksDB state-store provider
(``spark.sql.streaming.stateStore.providerClass`` = ROCKSDB_PROVIDER —
callers set it around ``start()``), and ``google.protobuf`` on the
PYTHON side — the TWS state-server protocol is protobuf-encoded and the
dedicated Python driver worker dies with an opaque "exited
unexpectedly (crashed)" without it. Environments lacking protobuf
(this sandbox included) can import and unit-test this module but not
run the TWS stream itself; :func:`stateful_histogram_stream` therefore
selects the TWS path when the runtime is available and otherwise an
``applyInPandasWithState`` fallback with IDENTICAL output semantics
(the MapState histogram flattened into two parallel arrays — exactly
the serialize-the-whole-map workaround the new API removes). The
registered gate (``tws_histogram_parity``) runs whichever path the
environment supports as a REAL stream against the batch GROUP BY
oracle, so the operator surface is driver-verified either way;
tests/test_tws.py additionally pins that both paths agree wherever
protobuf exists.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, event_type string, cnt long"

#: evict a user's histogram after this much event time with no activity
IDLE_GAP_MS = 60 * 60 * 1000

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class EventTypeHistogramProcessor(StatefulProcessor):
    """Running per-user event-type counts, emitted as update rows for
    every (user, event_type) touched by the micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._counts = handle.getMapState(
            "counts", "event_type string", "cnt long"
        )
        self._last_seen = handle.getValueState("last_seen", "last_ms long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        touched: dict[str, int] = {}
        last_ms = self._last_seen.get()[0] if self._last_seen.exists() else 0
        for pdf in rows:
            for et, n in pdf.groupby("event_type").size().items():
                if et not in touched:
                    prev = self._counts.getValue((et,))
                    touched[et] = prev[0] if prev is not None else 0
                touched[et] += int(n)
            # pandas timestamps are ns-resolution integers
            last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
        for et, cnt in touched.items():
            self._counts.updateValue((et,), (cnt,))
        self._last_seen.update((last_ms,))
        # Eviction timer: event-time, strictly beyond the current
        # watermark (a timer at/behind the watermark fires immediately).
        # Each batch registers a fresh timer; stale earlier timers fire
        # harmlessly — handleExpiredTimer re-checks true idleness.
        wm = timerValues.getCurrentWatermarkInMs()
        self._handle.registerTimer(max(last_ms + IDLE_GAP_MS, wm + 1))
        if touched:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(touched),
                    "event_type": list(touched.keys()),
                    "cnt": list(touched.values()),
                }
            )

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # A stale timer (user was active again since registration) must
        # not evict: only clear when the watermark really passed
        # last_seen + gap.
        last = self._last_seen.get()
        wm = timerValues.getCurrentWatermarkInMs()
        if last is None or wm >= last[0] + IDLE_GAP_MS:
            self._counts.clear()
            self._last_seen.clear()
        return iter(())

    def close(self) -> None:
        pass


def event_type_histogram_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """events (streaming) → per-(user, event_type) running-count update
    rows. The watermark bounds late data, timer firing, and state
    lifetime together."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=EventTypeHistogramProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="eventTime",
        )
    )


# -- applyInPandasWithState fallback (no-protobuf environments) --------

#: the MapState histogram flattened into one row: two parallel arrays
#: plus the last-seen watermark anchor — the classic-API encoding the
#: module docstring contrasts against.
FALLBACK_STATE_SCHEMA = "event_types array<string>, cnts array<long>, last_ms long"


def _histogram_update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        ets, cnts, last_ms = state.get
        hist = dict(zip(ets, cnts))
    else:
        hist, last_ms = {}, 0
    touched: dict[str, int] = {}
    for pdf in batches:
        for et, n in pdf.groupby("event_type").size().items():
            hist[et] = int(hist.get(et, 0)) + int(n)
            touched[et] = hist[et]
        last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
    state.update((list(hist.keys()), [int(v) for v in hist.values()], last_ms))
    # Event-time eviction, strictly beyond the watermark — same timer
    # contract as the TWS processor's registerTimer call.
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last_ms + IDLE_GAP_MS, wm + 1))
    if touched:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(touched),
                "event_type": list(touched.keys()),
                "cnt": list(touched.values()),
            }
        )


def event_type_histogram_fallback(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Same output contract as :func:`event_type_histogram_stream`,
    expressed with the classic ``applyInPandasWithState`` API — runs on
    any Spark 4 Python environment (no protobuf requirement)."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _histogram_update,
            OUTPUT_SCHEMA,
            FALLBACK_STATE_SCHEMA,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def has_tws_runtime() -> bool:
    """True when the transformWithState Python driver worker can run
    (its state-server protocol needs ``google.protobuf``)."""
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def stateful_histogram_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """The per-user event-type histogram on the best stateful API the
    environment supports: transformWithStateInPandas where the TWS
    runtime is available, else the applyInPandasWithState fallback.
    Output rows and eviction semantics are identical either way."""
    if has_tws_runtime():
        return event_type_histogram_stream(events, watermark)
    return event_type_histogram_fallback(events, watermark)
