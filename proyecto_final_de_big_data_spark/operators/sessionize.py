"""Batch sessionization: group each key's events into sessions split
wherever the gap to the previous event exceeds a threshold — the batch
twin of the streaming session windows (``streaming/windows.py``), for
corpora that arrive at rest.

Scale shape: one shuffle on the HIGH-cardinality session key (user /
device / connection — the same posture as ``operators/rolling.py``);
both window passes (the lag probe and the running session counter)
share that single sort, so Spark plans ONE Exchange + ONE Sort. Gaps
compare in integer MICROSECONDS (storage precision) so an oracle
stating ``ts - lag(ts) > INTERVAL ...`` replays the split bit-for-bit.

Determinism: the window orders by ``(ts, *order_cols)``. Pass a unique
tie-break column (e.g. the event id) whenever timestamps can repeat —
with ties unbroken, WHICH physical row of a tie group carries the
session-open flag is engine-dependent, and rows of the tie group
sorting before it would land in the previous session. With a total
order the assignment is exact and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rolling import _trailing_micros


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    order_cols: tuple[str, ...] = (),
    out_col: str = "session_idx",
) -> DataFrame:
    """Append ``out_col``: a per-key session index (1-based, dense in
    event-time order). A NULL timestamp makes the row its own
    single-event session opener ordered first (NULLS FIRST), keeping it
    visible rather than silently dropped; filter beforehand if NULL-ts
    rows should not count.
    """
    gap_us = _trailing_micros(gap)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [us.asc_nulls_first()] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(us).over(w)
    opens = (prev.isNull() | ((us - prev) > gap_us) | us.isNull()).cast("long")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(out_col, F.sum(opens).over(running))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (key, session): ``n_events``, ``session_start``,
    ``session_end``, ``duration_s``. The per-session aggregation reuses
    the sessionize shuffle's partitioning (same key prefix), so AQE
    plans it without a second full exchange of the event stream."""
    s = sessionize(df, key_col, ts_col, gap, order_cols)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col).cast("timestamp"))
             - F.unix_micros(F.min(ts_col).cast("timestamp"))) / 1_000_000.0
        ).alias("duration_s"),
    )
