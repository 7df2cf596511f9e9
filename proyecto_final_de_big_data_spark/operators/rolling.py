"""Rolling time-range window statistics (trailing-window baselines,
anomaly z-scores).

Scale shape: the window partitions on a HIGH-CARDINALITY key (per
user/entity), never on a low-cardinality dimension like event_type — a
RANGE frame over ``partitionBy(event_type)`` would funnel the whole
corpus through a handful of window partitions at 100 TB. Frame bounds
are integer MICROSECONDS (``unix_micros``), the storage precision, so
an oracle computing the same frame over ``epoch_us`` replays it
bit-for-bit (a seconds-cast frame silently truncates fractional-second
timestamps and shifts frame membership).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_rolling_stats(
    df: DataFrame,
    partition_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    trailing: str = "1 hour",
    min_n: int = 5,
) -> DataFrame:
    """Append trailing-window mean/stddev/count and a z-score vs that
    trailing baseline (NULL when the window holds < ``min_n`` rows or
    has zero variance).

    The frame is ``[t - trailing, t]`` inclusive on both ends — the
    semantics of ``Window.rangeBetween(-L, 0)`` and of SQL ``RANGE
    BETWEEN L PRECEDING AND CURRENT ROW``, including peers at the
    current timestamp.
    """
    us = _trailing_micros(trailing)
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-us, 0)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n = F.count(F.lit(1)).over(w)
    z: Column = F.when(
        (n >= min_n) & (std > 0), (F.col(value_col) - mean) / std
    )
    return (
        df.withColumn("roll_mean", mean)
        .withColumn("roll_std", std)
        .withColumn("roll_n", n)
        .withColumn("zscore", z)
    )


_UNITS_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86400 * 1_000_000,
}


def _trailing_micros(trailing: str) -> int:
    qty, unit = trailing.strip().split()
    unit = unit.rstrip("s")
    if unit not in _UNITS_US:
        raise ValueError(f"unsupported trailing unit {unit!r}; use {list(_UNITS_US)}")
    return int(qty) * _UNITS_US[unit]


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Trapezoidal time-weighted average per key — the right mean for
    IRREGULARLY sampled series (a value held for an hour must weigh 60×
    one held for a minute; the plain ``avg`` is sampling-rate-biased).

    TWA = Σ (vᵢ+vᵢ₊₁)/2 · Δtᵢ / (t_N − t_0), computed with one lead
    window per key (timestamps in integer microseconds so the weights
    are exact) and one grouped aggregation that REUSES the window's
    key partitioning — a single shuffle end to end, keyed on the
    high-cardinality series key. A single-observation key has zero
    span and falls back to its plain value.

    ``tiebreak_col`` totals the order within equal timestamps so every
    engine and partitioning walks segments identically.

    Returns (key_cols…, n_points, twa).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    # cast: unix_micros rejects TIMESTAMP_NTZ; the session is UTC-pinned
    # (session.py) so the cast is value-preserving.
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    seg = (
        (F.lead(value_col).over(w) + F.col(value_col))
        / 2.0
        * (F.lead(t).over(w) - t).cast("double")
    )
    staged = df.select(
        *key_cols,
        F.col(value_col).alias("__v"),
        t.alias("__t"),
        seg.alias("__seg"),
    )
    span = (F.max("__t") - F.min("__t")).cast("double")
    return staged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.when(span > 0, F.sum("__seg") / span)
        .otherwise(F.avg("__v"))  # zero span: deterministic plain mean
        .alias("twa"),
    )
