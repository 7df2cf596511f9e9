"""Classical seasonal decomposition with a linear trend — per key:
``y = trend(x) + seasonal(slot) + remainder`` — the "is this KPI's
weekly shape stable, and how much of the signal is seasonality?"
readout monitoring surfaces run over time-series tables.

Method (the classical-decomposition recipe with an OLS trend instead
of a centered moving average, so the whole thing stays closed-form and
engine-restatable):

1. fit the per-key OLS line over the time index — the SAME
   sufficient-statistics normal-equations algebra as
   ``operators/trend.py:per_key_linear_trend`` (this operator is its
   decomposition superset);
2. seasonal index s_j = mean detrended residual over season slot j;
3. remainder = residual − s_j; seasonal strength per key is Hyndman's
   ``F_s = max(0, 1 − SS_remainder / SS_detrended)`` — 0 means the
   slots explain nothing, 1 means the season explains ALL detrended
   variation.

Scale shape (100 TB): two aggregation passes over the fact frame (OLS
sums, then residual sums per (key, slot)) plus ONE broadcast join of
the key-cardinality trend frame back onto the facts — no window, no
sort, no per-key iteration. All shares/strengths reduce from slot-level
sums at answer scale.

Extension surface — the reference has hour/dow count and mean marts
(`/root/reference/src/analisis.py`, SURVEY §2.4 A1-A3) but no
decomposition of trend vs seasonality; this is the engine-side
generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEASONS = {
    "dow": lambda ts: F.dayofweek(ts),
    "hour": lambda ts: F.hour(ts),
    "month": lambda ts: F.month(ts),
}


def seasonal_decompose(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    season: str = "dow",
) -> DataFrame:
    """Per (key..., slot) decomposition profile:

    ``(*keys, slot, n_obs, seasonal_index, slope, intercept,
    seasonal_strength)``

    - ``slot`` is the season bucket (``dow`` 1=Sunday per Spark's
      dayofweek, ``hour`` 0-23, ``month`` 1-12);
    - ``seasonal_index`` is the mean detrended residual in the slot —
      additive units of ``value_col``;
    - ``slope``/``intercept`` are the per-key OLS trend over the epoch-
      day index (x = days since 1970-01-01), repeated on each slot row;
    - ``seasonal_strength`` is the per-key Hyndman F_s, repeated on
      each slot row.

    Rows with NULL timestamp or NULL/NaN value are excluded. Keys with
    a degenerate trend fit (< 2 points or zero x-variance) are dropped
    — decomposition over an unfittable trend is undefined, and a key
    whose observations all land on one day has no trend to remove.
    """
    if season not in _SEASONS:
        raise ValueError(
            f"seasonal_decompose season must be one of "
            f"{sorted(_SEASONS)}; got {season!r}"
        )
    ts = F.col(ts_col)
    y = F.col(value_col).cast("double")
    x = F.datediff(F.to_date(ts), F.lit("1970-01-01")).cast("double")
    base = df.filter(ts.isNotNull() & y.isNotNull() & ~F.isnan(y)).select(
        *keys,
        x.alias("__x"),
        y.alias("__y"),
        _SEASONS[season](ts).alias("slot"),
    )
    # Pass 1: the trend.py normal-equations fit, unrounded (rounding
    # belongs to the OUTPUT columns; residuals need full precision so
    # both engines derive them from identically-defined doubles).
    sums = base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("__n")
    var_x = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = F.when((n >= 2) & (var_x > 0), cov / var_x)
    trend = sums.select(
        *keys,
        slope.alias("__slope"),
        ((F.col("__sy") - slope * F.col("__sx")) / n).alias("__icept"),
    ).filter(F.col("__slope").isNotNull())
    # Pass 2: residual sums per (key, slot); the trend frame is
    # key-cardinality, so the join back onto facts broadcasts.
    r = F.col("__y") - (F.col("__icept") + F.col("__slope") * F.col("__x"))
    per_slot = (
        base.join(F.broadcast(trend), keys, "inner")
        .select(
            *keys,
            "slot",
            "__slope",
            "__icept",
            r.alias("__r"),
        )
        .groupBy(*keys, "slot")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("__r").alias("__sr"),
            F.sum(F.col("__r") * F.col("__r")).alias("__srr"),
            F.first("__slope").alias("__slope"),
            F.first("__icept").alias("__icept"),
        )
    )
    # Answer scale: key-level SS from slot sums. SS_detrended uses the
    # global residual mean (exactly 0 in theory; kept for exactness),
    # SS_remainder subtracts each slot's own mean.
    from pyspark.sql.window import Window

    w_key = Window.partitionBy(*keys)
    n_tot = F.sum("n_obs").over(w_key).cast("double")
    sr_tot = F.sum("__sr").over(w_key)
    srr_tot = F.sum("__srr").over(w_key)
    ss_detrended = srr_tot - sr_tot * sr_tot / n_tot
    ss_remainder = F.sum(
        F.col("__srr")
        - F.col("__sr") * F.col("__sr") / F.col("n_obs").cast("double")
    ).over(w_key)
    strength = F.when(
        ss_detrended > 0,
        F.greatest(F.lit(0.0), 1.0 - ss_remainder / ss_detrended),
    ).otherwise(F.lit(0.0))
    return per_slot.select(
        *keys,
        "slot",
        "n_obs",
        F.round(F.col("__sr") / F.col("n_obs"), 6).alias("seasonal_index"),
        F.round("__slope", 6).alias("slope"),
        F.round("__icept", 6).alias("intercept"),
        F.round(strength, 6).alias("seasonal_strength"),
    )
