"""Per-key linear trend estimation — OLS slope/intercept/R² per group
computed from sufficient statistics in ONE aggregation pass. The
metric-trend detector ("is this KPI drifting up?") every monitoring
surface runs over a time series table.

Scale shape (100 TB): no window, no sort, no per-key iteration — one
``groupBy(keys)`` aggregation collecting (n, Σx, Σy, Σxx, Σxy, Σyy)
with map-side partial aggregation, then closed-form arithmetic at
group cardinality. This is the 1-D special case of the normal-equations
trick the ML linear gate uses (``queries/ml_queries.py:_OLS_CTE``),
kept exactly restatable in SQL so trends hash-match across engines.

Degenerate groups are explicit, not NaN: a group with < 2 points or
zero x-variance gets NULL slope/intercept/r2 (you cannot fit a line),
never a divide-by-zero — and under ANSI mode the guards are required,
not cosmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_key_linear_trend(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """``(*keys, n_points, slope, intercept, r2)`` — OLS of y on x per
    key group, rounded to ``decimals``. slope/intercept/r2 are NULL
    when the fit is degenerate (< 2 points, zero x-variance; r2 also
    NULL for zero y-variance, where it is undefined)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    # Complete pairs only: counting NULL/NaN rows that every sum skips
    # would bias the normal equations silently (n_points=4 with 3
    # summed pairs fits the WRONG line, it does not return NULL).
    df = df.filter(
        x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    )
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
        F.sum(y * y).alias("__syy"),
    )
    n = F.col("__n")
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, sxy, syy = F.col("__sxx"), F.col("__sxy"), F.col("__syy")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when((n >= 2) & (var_x > 0), cov / var_x)
    intercept = F.when(
        (n >= 2) & (var_x > 0), (sy - (cov / var_x) * sx) / n
    )
    r2 = F.when(
        (n >= 2) & (var_x > 0) & (var_y > 0), (cov * cov) / (var_x * var_y)
    )
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n_points"),
        F.round(slope, decimals).alias("slope"),
        F.round(intercept, decimals).alias("intercept"),
        F.round(r2, decimals).alias("r2"),
    )
