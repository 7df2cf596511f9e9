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


def mann_kendall(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    z_crit: float = 1.959963984540054,  # 95% two-sided normal quantile
    max_points: int = 10_000,
    decimals: int = 6,
) -> DataFrame:
    """Mann–Kendall monotonic-trend test + Sen's slope per key:
    ``(*key_cols, n, s_stat, var_s, z, trend, sen_slope)`` (Mann,
    Econometrica 1945; Kendall 1975; Sen, JASA 1968 — public
    literature). The NON-parametric sibling of
    :func:`per_key_linear_trend`: OLS asks "what line fits?", MK asks
    "is there ANY monotonic drift?" without assuming linearity or
    normality, and Sen's slope is the outlier-robust rate estimate —
    the standard pairing for KPI drift monitoring.

        S = Σ_{i<j} sign(x_j − x_i)                (times ordered)
        Var(S) = [n(n−1)(2n+5) − Σ_k t_k(t_k−1)(2t_k+5)] / 18
        z = (S∓1)/√Var(S)  (continuity-corrected; 0 when S = 0)
        sen_slope = median over pairs of (x_j − x_i)/(t_j − t_i)

    with t_k the value-tie group sizes. ``trend`` reads 'increasing'
    / 'decreasing' / 'no_trend' by comparing z against ``z_crit``
    (embedded as ONE double literal in both engines — the same
    portability convention as the z-test gates); z and trend are NULL
    when Var ≤ 0 (every value tied). Tie counts are DOUBLES before
    cubing (t³ overflows long at t ≈ 2.1M — the rank-test rule). The
    median is exact linear-interpolation ``percentile`` ==
    ``quantile_cont``, the house quantile-parity bridge. DUPLICATE
    timestamps within a key hard-fail in-plan (two observations at
    one grid point make S ill-defined; pre-aggregate the grid first —
    the raise_error posture, not a silent bias).

    Scale shape (100 TB): the input is a PRE-AGGREGATED series grid
    (the :func:`~.stats.autocorrelation` posture), because the pair
    stage is inherently O(n²) per key — ENFORCED at ``max_points``
    (in-plan raising filter over a broadcast biggest-key count —
    raises at action time naming the fix, before the join stage can
    run, the ks_two_sample discipline; 10k grid points = 50M pairs
    per key, parallel across keys). One key-equi self-join filtered to t_i <
    t_j, one tie aggregation at (key, value) cardinality, one
    key-cardinality reduce. No window over data, no collect.

    Extension surface — the reference has no statistics stage;
    extension per SURVEY §8, completing the trend family.
    """
    if not key_cols:
        raise ValueError("mann_kendall needs at least one key column")
    v = F.col(value_col).cast("double")
    base = series.select(
        *key_cols,
        F.col(t_col).cast("long").alias("__t"),
        v.alias("__x"),
    ).filter(F.col("__x").isNotNull() & ~F.isnan("__x"))
    for c in key_cols:
        base = base.filter(F.col(c).isNotNull())

    # max_points guard IN-PLAN (the hyptest._apply_grid_guard posture):
    # a 1-row biggest-key count rides a broadcast with a raising filter
    # on the pair join's left input, so an oversized key raises while
    # the broadcast materializes — before the O(n²) join stage can be
    # scheduled — without the pre-r11 serialized driver action during
    # query construction. All rows pass the healthy-path filter, so
    # values are unchanged.
    guard = (
        base.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__n"))
    )
    gate = F.when(
        F.col("__n") > max_points,
        F.raise_error(
            F.concat(
                F.lit("mann_kendall: a key holds "),
                F.col("__n").cast("string"),
                F.lit(
                    " grid points — the pairwise stage is O(n²) and "
                    f"max_points={max_points:,}. Aggregate the series to "
                    "a coarser grid first, or raise max_points if the "
                    "grid is genuinely answer-scale."
                ),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))

    stats = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("__t").alias("__nt"),
    ).withColumn(
        "n",
        F.when(
            F.col("n") == F.col("__nt"), F.col("n")
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "mann_kendall: %d rows but %d distinct timestamps in "
                    "one key — duplicate grid points make S ill-defined; "
                    "pre-aggregate the series grid first",
                    F.col("n"),
                    F.col("__nt"),
                )
            )
        ),
    )
    tk = F.col("__tk").cast("double")
    ties = (
        base.groupBy(*key_cols, "__x")
        .agg(F.count(F.lit(1)).alias("__tk"))
        .groupBy(*key_cols)
        .agg(
            F.sum(tk * (tk - 1.0) * (2.0 * tk + 5.0)).alias("__tie_sum")
        )
    )
    a = (
        base.select(
            *key_cols, F.col("__t").alias("__ti"), F.col("__x").alias("__xi")
        )
        .crossJoin(F.broadcast(guard))
        .filter(gate)
        .drop("__n")
    )
    b = base.select(
        *key_cols, F.col("__t").alias("__tj"), F.col("__x").alias("__xj")
    )
    pr = a.join(b, list(key_cols)).filter(F.col("__ti") < F.col("__tj"))
    sign = (
        F.when(F.col("__xj") > F.col("__xi"), 1)
        .when(F.col("__xj") < F.col("__xi"), -1)
        .otherwise(0)
    )
    slope = (F.col("__xj") - F.col("__xi")) / (
        (F.col("__tj") - F.col("__ti")).cast("double")
    )
    pairs = pr.groupBy(*key_cols).agg(
        F.sum(sign).cast("long").alias("s_stat"),
        F.percentile(slope, F.lit(0.5)).alias("__sen"),
    )
    out = stats.join(ties, list(key_cols)).join(pairs, list(key_cols), "left")
    nd = F.col("n").cast("double")
    var_s = (
        nd * (nd - 1.0) * (2.0 * nd + 5.0) - F.col("__tie_sum")
    ) / 18.0
    s = F.col("s_stat").cast("double")
    z = F.when(
        var_s > 0,
        F.when(F.col("s_stat") > 0, (s - 1.0) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (s + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    trend = F.when(z > z_crit, F.lit("increasing")).when(
        z < -z_crit, F.lit("decreasing")
    )
    trend = F.when(z.isNotNull(), F.coalesce(trend, F.lit("no_trend")))
    return out.select(
        *key_cols,
        F.col("n").cast("long").alias("n"),
        "s_stat",
        F.round(var_s, decimals).alias("var_s"),
        F.round(z, decimals).alias("z"),
        trend.alias("trend"),
        F.round(F.col("__sen"), decimals).alias("sen_slope"),
    )
