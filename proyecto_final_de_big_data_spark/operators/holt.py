"""Holt linear-trend (double exponential) smoothing + one-step-ahead
forecast anomalies over per-key series — the classic level+trend
upgrade of :mod:`.anomaly`'s EWMA for drifting metrics: an EWMA lags a
trending series by a constant offset and flags the trend itself, while
Holt's second state absorbs the slope so flags fire on genuine level
breaks (Holt 1957 / Hyndman & Athanasopoulos FPP3 §8.2 — public
literature).

Recursion (seeded l_1 = x_1, b_1 = 0 — the single-point-safe seed;
pass a pre-differenced series or a warmup slice if the textbook
b_1 = x_2 − x_1 seed matters for your use):

    f_t = l_{t-1} + b_{t-1}                      (one-step forecast)
    l_t = α·x_t + (1−α)·f_t
    b_t = β·(l_t − l_{t-1}) + (1−β)·b_{t-1}

Evaluated as a literal left fold in the exact operation order above,
so a SQL oracle replaying the identical fold (DuckDB ``list_reduce``
over the same ordered prefix) reproduces every level/trend/forecast
bit-for-bit — IEEE doubles, identical op order (the :mod:`.anomaly`
parity discipline).

Scale shape (100 TB): identical to EWMA — the input is a SERIES frame
(key, t, value) already aggregated to a grid, each key's series is
collected into ONE sorted array (``max_points`` hard-fail guard, the
:mod:`.series` collector) and the inherently sequential two-state
recursion runs as one in-memory fold per key, embarrassingly parallel
across keys; the fold grows an immutable array (O(n²) element copies —
trivial on monitoring grids, which is why ``max_points`` defaults to
10_000). Residual scale is one more keyed aggregation of three
doubles.

Extension surface — the reference has no time-series smoothing stage
(`/root/reference` computes only descriptive marts); extension per
SURVEY §8, the forecasting sibling of the EWMA/CUSUM monitoring
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_forecast_anomaly(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    k: float = 3.0,
    max_points: int = 10_000,
    decimals: int = 6,
) -> DataFrame:
    """``(*key_cols, t, value, level, trend, forecast, resid,
    is_anomaly)`` per input row.

    ``forecast`` is the one-step-ahead prediction l+b of the PREVIOUS
    point's state (NULL on each key's first point — no state yet);
    ``resid = value − forecast``; ``is_anomaly`` flags ``|resid| >
    k·σ`` where σ is the population stddev of the key's residuals
    (moment form, clamped at 0 against float cancellation), NULL where
    σ is undefined (fewer than 2 residuals) or zero. ``level``,
    ``trend``, ``forecast`` and ``resid`` round to ``decimals``."""
    if not key_cols:
        raise ValueError("holt_forecast_anomaly needs at least one key column")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    a, g = float(alpha), float(beta)
    oma, omg = 1.0 - a, 1.0 - g

    from .series import collect_sorted_series

    arr = collect_sorted_series(
        df, key_cols, t_col, value_col, max_points, "holt_forecast_anomaly"
    )

    def _step(acc, e):
        prev = F.element_at(acc, -1)
        # l' inlined twice so the fold carries only (l, b) — both
        # occurrences are the same expression tree, one evaluation
        # order, so the DuckDB replay matches bit-for-bit.
        lvl = F.lit(a) * e["x"] + F.lit(oma) * (prev["l"] + prev["b"])
        return F.concat(
            acc,
            F.array(
                F.when(
                    F.size(acc) == 0,
                    F.struct(e["x"].alias("l"), F.lit(0.0).alias("b")),
                ).otherwise(
                    F.struct(
                        lvl.alias("l"),
                        (
                            F.lit(g) * (lvl - prev["l"]) + F.lit(omg) * prev["b"]
                        ).alias("b"),
                    )
                )
            ),
        )

    states = F.aggregate(
        F.col("__pts"),
        F.expr("CAST(array() AS ARRAY<STRUCT<l: DOUBLE, b: DOUBLE>>)"),
        _step,
    )
    pts = (
        arr.withColumn("__st", states)
        .select(
            *key_cols,
            F.posexplode("__pts").alias("__i", "__pt"),
            F.col("__st"),
        )
        .select(
            *key_cols,
            F.col("__pt.t").alias(t_col),
            F.col("__pt.x").alias(value_col),
            F.element_at("__st", F.col("__i") + 1)["l"].alias("__lvl"),
            F.element_at("__st", F.col("__i") + 1)["b"].alias("__trd"),
            F.when(
                F.col("__i") > 0,
                F.element_at("__st", F.col("__i"))["l"]
                + F.element_at("__st", F.col("__i"))["b"],
            ).alias("__fc"),
        )
        .withColumn("__resid", F.col(value_col) - F.col("__fc"))
    )
    scale = pts.groupBy(*key_cols).agg(
        F.count("__resid").cast("double").alias("__nr"),
        F.sum("__resid").alias("__sr"),
        F.sum(F.col("__resid") * F.col("__resid")).alias("__srr"),
    )
    # Same clamp rationale as anomaly.py: cancellation can push the
    # moment numerator epsilon-negative; NaN compares would silently
    # un-flag instead of producing the documented NULL.
    sigma = F.when(
        F.col("__nr") >= 2,
        F.sqrt(
            F.greatest(
                (F.col("__nr") * F.col("__srr") - F.col("__sr") * F.col("__sr"))
                / (F.col("__nr") * F.col("__nr")),
                F.lit(0.0),
            )
        ),
    )
    return (
        pts.join(scale.withColumn("__sigma", sigma), key_cols)
        .select(
            *key_cols,
            t_col,
            value_col,
            F.round("__lvl", decimals).alias("level"),
            F.round("__trd", decimals).alias("trend"),
            F.round("__fc", decimals).alias("forecast"),
            F.round("__resid", decimals).alias("resid"),
            F.when(
                F.col("__resid").isNotNull() & (F.col("__sigma") > 0),
                F.abs(F.col("__resid")) > F.lit(float(k)) * F.col("__sigma"),
            ).alias("is_anomaly"),
        )
    )


def holt_winters_forecast_anomaly(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    season: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    k: float = 3.0,
    max_points: int = 10_000,
    decimals: int = 6,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal (triple exponential) smoothing +
    one-step-ahead forecast anomalies — the seasonal completion of
    :func:`holt_forecast_anomaly` (Winters 1960 / Hyndman &
    Athanasopoulos FPP3 §8.3 — public literature): the third state
    absorbs a period-``season`` additive cycle, so flags fire on
    genuine breaks instead of every seasonal peak.

    Seeding (deterministic, first-season): with m = ``season`` and
    x_1..x_m the key's first season, l_m = mean(x_1..x_m), b_m = 0,
    s_i = x_i − l_m for i = 1..m. Recursion for t > m, evaluated as a
    literal left fold in exactly this operation order:

        f_t = l_{t−1} + b_{t−1} + s_{t−m}            (one-step forecast)
        l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(x_t − l_{t−1} − b_{t−1}) + (1−γ)·s_{t−m}

    Output per input row: ``(*key_cols, t, value, level, trend,
    seasonal, forecast, resid, is_anomaly)``. Warm-up rows (t <= m)
    carry the seed readout (level = l_m, trend = 0, seasonal = s_t)
    with NULL forecast/resid; keys with fewer than ``season`` points
    have no defined seasonal seed and carry NULL
    level/trend/seasonal/forecast/resid (reported honestly, not
    raised — the msprt warm-up posture). ``is_anomaly`` flags
    ``|resid| > k·σ`` (population σ of the key's residuals, clamped
    at 0), NULL where σ is undefined or zero.

    Scale shape (100 TB): identical to Holt/EWMA — series collected
    per key (``max_points`` hard-fail), ONE in-memory fold per key
    (the fold's state array holds every (l, b, s) triple so the
    s_{t−m} lookup is an index from the end — O(n) state, no ring
    bookkeeping), embarrassingly parallel across keys, one keyed
    residual-scale aggregation. A SQL oracle replays the same
    arithmetic as a LAMBDA-FREE recursive CTE (scalar (l, b, q1..q7)
    DOUBLE columns, one row per point, positional column rotation
    for the seasonal window) — identical IEEE order; both earlier
    ``list_reduce`` restatements (r10 ring-state, r11 flat
    grow-state) proved DuckDB-build-fragile (driver hash-fail while
    locally hash-exact) and were retired, see ORACLE_PORTABILITY.md.

    Extension surface — the reference has no time-series stage;
    extension per SURVEY §8 (see module docstring).
    """
    if season < 2:
        raise ValueError(f"season must be >= 2, got {season}")
    if not key_cols:
        raise ValueError("holt_winters_forecast_anomaly needs at least one key column")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    if not (0.0 <= gamma <= 1.0):
        raise ValueError(f"gamma must be in [0, 1], got {gamma}")
    m = int(season)
    a, g, c = float(alpha), float(beta), float(gamma)
    oma, omg, omc = 1.0 - a, 1.0 - g, 1.0 - c

    from .series import collect_sorted_series

    arr = collect_sorted_series(
        df, key_cols, t_col, value_col, max_points, "holt_winters_forecast_anomaly"
    )
    xs = F.transform(F.col("__pts"), lambda p: p["x"])
    n = F.size("__pts")
    # First-season mean as an explicit left-fold sum (same IEEE order
    # as the oracle's list_reduce restatement; 0.0 + x1 == x1 exactly).
    mmean = (
        F.aggregate(F.slice(xs, 1, m), F.lit(0.0), lambda s, x: s + x)
        / F.lit(float(m))
    )
    seed = F.transform(
        F.sequence(F.lit(1), F.lit(m)),
        lambda i: F.struct(
            mmean.alias("l"),
            F.lit(0.0).alias("b"),
            (F.element_at(xs, i) - mmean).alias("s"),
        ),
    )

    def _step(acc, e):
        prev = F.element_at(acc, -1)
        sold = F.element_at(acc, -m)["s"]
        # l' inlined into b's expression (the holt_forecast_anomaly
        # discipline): one expression tree, one evaluation order.
        lvl = F.lit(a) * (e["x"] - sold) + F.lit(oma) * (prev["l"] + prev["b"])
        return F.concat(
            acc,
            F.array(
                F.struct(
                    lvl.alias("l"),
                    (F.lit(g) * (lvl - prev["l"]) + F.lit(omg) * prev["b"]).alias(
                        "b"
                    ),
                    (
                        F.lit(c) * (e["x"] - prev["l"] - prev["b"])
                        + F.lit(omc) * sold
                    ).alias("s"),
                )
            ),
        )

    states = F.when(
        n >= m,
        F.aggregate(
            F.slice(F.col("__pts"), F.lit(m + 1), F.greatest(n - m, F.lit(0))),
            seed,
            _step,
        ),
    )
    i1 = F.col("__i") + 1  # 1-based point index
    st_i = F.element_at("__st", i1)
    st_prev = F.element_at("__st", F.col("__i"))
    st_season = F.element_at("__st", i1 - m)
    fc = F.when(
        i1 > m, st_prev["l"] + st_prev["b"] + st_season["s"]
    )
    pts = (
        arr.withColumn("__st", states)
        .select(
            *key_cols,
            F.posexplode("__pts").alias("__i", "__pt"),
            F.col("__st"),
        )
        .select(
            *key_cols,
            F.col("__pt.t").alias(t_col),
            F.col("__pt.x").alias(value_col),
            st_i["l"].alias("__lvl"),
            st_i["b"].alias("__trd"),
            st_i["s"].alias("__sea"),
            fc.alias("__fc"),
        )
        .withColumn("__resid", F.col(value_col) - F.col("__fc"))
    )
    scale = pts.groupBy(*key_cols).agg(
        F.count("__resid").cast("double").alias("__nr"),
        F.sum("__resid").alias("__sr"),
        F.sum(F.col("__resid") * F.col("__resid")).alias("__srr"),
    )
    sigma = F.when(
        F.col("__nr") >= 2,
        F.sqrt(
            F.greatest(
                (F.col("__nr") * F.col("__srr") - F.col("__sr") * F.col("__sr"))
                / (F.col("__nr") * F.col("__nr")),
                F.lit(0.0),
            )
        ),
    )
    return (
        pts.join(scale.withColumn("__sigma", sigma), key_cols)
        .select(
            *key_cols,
            t_col,
            value_col,
            F.round("__lvl", decimals).alias("level"),
            F.round("__trd", decimals).alias("trend"),
            F.round("__sea", decimals).alias("seasonal"),
            F.round("__fc", decimals).alias("forecast"),
            F.round("__resid", decimals).alias("resid"),
            F.when(
                F.col("__resid").isNotNull() & (F.col("__sigma") > 0),
                F.abs(F.col("__resid")) > F.lit(float(k)) * F.col("__sigma"),
            ).alias("is_anomaly"),
        )
    )
