"""EWMA smoothing + one-step-ahead anomaly flags over per-key series.

The monitoring classic: smooth each key's ordered series with an
exponentially-weighted moving average, score every point by its
deviation from the PREVIOUS point's smoothed value (the one-step-ahead
forecast residual — using the current EWMA would leak the point into
its own baseline), and flag residuals beyond ``k`` residual standard
deviations. Deterministic end to end: no fitting, no sampling.

Scale shape (100 TB): the input is a SERIES frame (key, t, value) —
the caller has already aggregated raw events onto a time grid, so
cardinality is keys × grid points, not raw events. Each key's series
is collected to one ordered array (the `sessionize`/`paths`
discipline: bounded series per key — a daily grid is ≤ a few thousand
points even over a decade; ``max_points`` hard-fails on runaway keys
rather than OOMing an executor) and the EWMA recursion — inherently
sequential per key — runs as ONE in-memory array fold per key,
embarrassingly parallel across keys. Honest cost note: the fold grows
an immutable array (Catalyst concat copies on append), so n points
cost O(n²) element copies — trivial on the daily/hourly monitoring
grids this targets (3.6k points ≈ 10⁷ copies), which is why
``max_points`` defaults to 10_000; aggregate longer series to a
coarser grid first. The explode back to rows restores series
cardinality; the residual-scale pass is one more keyed aggregation of
three doubles per key.

The recursion s_t = α·x_t + (1−α)·s_{t−1}, s_1 = x_1 is evaluated as
a literal left fold, so a SQL oracle replaying the identical fold
(DuckDB ``list_reduce`` over the same prefix) reproduces it
bit-for-bit — IEEE doubles, identical operation order.

Extension surface — the reference has no time-series monitoring stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_anomaly(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    alpha: float = 0.3,
    k: float = 3.0,
    max_points: int = 10_000,
    decimals: int = 6,
) -> DataFrame:
    """``(*key_cols, t, value, ewma, resid, is_anomaly)`` per input row.

    ``ewma`` is the recursion above; ``resid = value − ewma_prev``
    (NULL on each key's first point); ``is_anomaly`` flags
    ``|resid| > k·σ`` where σ is the population stddev of the key's
    residuals (computed from sums: sqrt((n·Σr² − (Σr)²)/n²)), NULL
    where σ is undefined (fewer than 2 residuals) or zero.
    """
    if not key_cols:
        raise ValueError("ewma_anomaly needs at least one key column")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    a = float(alpha)
    one_minus = 1.0 - a

    from .series import collect_sorted_series

    # NULL/NaN exclusion + the max_points hard-fail live in the shared
    # collector (one poisoned cell would otherwise NULL every s_t after
    # it, silently un-flaggable).
    arr = collect_sorted_series(
        df, key_cols, t_col, value_col, max_points, "ewma_anomaly"
    )
    # One left fold per key: append s_t = α·x + (1−α)·s_{t−1} (first
    # point seeds the state). Sequential per series; array growth makes
    # it O(n²) copies — see the module docstring's max_points note.
    ew = F.aggregate(
        F.col("__pts"),
        F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, e["x"]).otherwise(
                    F.lit(a) * e["x"] + F.lit(one_minus) * F.element_at(acc, -1)
                )
            ),
        ),
    )
    pts = (
        arr.withColumn("__ew", ew)
        .select(
            *key_cols,
            F.posexplode("__pts").alias("__i", "__pt"),
            F.col("__ew"),
        )
        .select(
            *key_cols,
            F.col("__pt.t").alias(t_col),
            F.col("__pt.x").alias(value_col),
            F.element_at("__ew", F.col("__i") + 1).alias("ewma"),
            F.when(
                F.col("__i") > 0,
                F.col("__pt.x") - F.element_at("__ew", F.col("__i")),
            ).alias("resid"),
        )
    )
    scale = pts.groupBy(*key_cols).agg(
        F.count("resid").cast("double").alias("__nr"),
        F.sum("resid").alias("__sr"),
        F.sum(F.col("resid") * F.col("resid")).alias("__srr"),
    )
    # greatest(..., 0): float cancellation on a near-constant series can
    # push the moment numerator epsilon-negative; sqrt of that is NaN,
    # and NaN > 0 is TRUE in Spark's ordering, so without the clamp the
    # flag guard would pass and every comparison against k*NaN would
    # read false — silent non-detection instead of the documented NULL.
    sigma = F.when(
        F.col("__nr") >= 2,
        F.sqrt(
            F.greatest(
                (
                    F.col("__nr") * F.col("__srr")
                    - F.col("__sr") * F.col("__sr")
                )
                / (F.col("__nr") * F.col("__nr")),
                F.lit(0.0),
            )
        ),
    )
    return (
        pts.join(scale, key_cols)
        .withColumn("__sigma", sigma)
        .select(
            *key_cols,
            t_col,
            value_col,
            F.round("ewma", decimals).alias("ewma"),
            F.round("resid", decimals).alias("resid"),
            F.when(
                F.col("resid").isNotNull() & (F.col("__sigma") > 0),
                F.abs(F.col("resid")) > F.lit(float(k)) * F.col("__sigma"),
            ).alias("is_anomaly"),
        )
    )
