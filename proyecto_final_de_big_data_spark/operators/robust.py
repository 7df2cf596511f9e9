"""Robust outlier detection via median / MAD — the heavy-tail-safe
sibling of the quantile-clip filter in :mod:`.clean`. Mean/stddev
z-scores are circular on dirty data (the outliers you are hunting
inflate the stddev that defines them); the median absolute deviation
has a 50% breakdown point, so the fence holds even when half the
group is garbage.

A point is flagged when ``|x - median| > k · 1.4826 · MAD`` — the
1.4826 consistency constant makes MAD estimate σ under normality, so
``k`` reads in sigma units (k=3.5 is the Iglewicz-Hoaglin modified
z-score convention).

Scale shape (100 TB): two aggregation passes (median, then MAD of
residuals against it) plus one flagging pass — each a single shuffle
— with the group-cardinality center/spread frames joined back in
(broadcast-sized: groups, not rows). Exact percentiles buffer each
group's values in the aggregation state, which is fine for the
moderate-cardinality monitoring groups this profile targets but NOT
for millions of rows per group — ``exact=False`` switches both passes
to ``approx_percentile`` (KLL-sketch, bounded memory) for the
100-TB path. The contract gate runs ``exact=True`` because DuckDB's
``quantile_cont`` is exact interpolated — the two modes answer the
same question at different fidelity, and only the exact one is
hash-restatable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 1.4826


def mad_outlier_profile(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    k: float = 3.5,
    exact: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """``(*by, n, median, mad, n_outliers, outlier_frac)`` per group —
    NULL measures are ignored throughout (they are neither outliers
    nor part of n). ``mad == 0`` degenerates to flagging every point
    off the median, the honest reading of "more than half the group
    sits exactly at one value"."""
    by = by or []
    x = F.col(col).cast("double")
    # NaN sorts GREATEST in Spark: it would shift the exact percentiles,
    # count into n, and always flag as an outlier — while DuckDB's
    # quantile_cont treats it differently, silently diverging. Exclude
    # NaN rows; NULL rows still flow through (ignored by count/percentile)
    # so the documented NULL semantics are unchanged.
    df = df.filter(x.isNull() | ~F.isnan(x))

    def _median(c):
        if exact:
            return F.percentile(c, F.lit(0.5))
        return F.percentile_approx(c, F.lit(0.5), F.lit(10000))

    med = df.groupBy(*by).agg(_median(x).alias("__med"))
    joined = df.join(F.broadcast(med), by) if by else df.crossJoin(med)
    mad = joined.groupBy(*by).agg(
        _median(F.abs(x - F.col("__med"))).alias("__mad")
    )
    scored = joined.join(F.broadcast(mad), by) if by else joined.crossJoin(mad)
    fence = F.lit(k) * F.lit(MAD_CONSISTENCY) * F.col("__mad")
    is_out = F.when(
        x.isNotNull(), (F.abs(x - F.col("__med")) > fence).cast("long")
    )
    prof = scored.groupBy(*by).agg(
        F.count(x).alias("n"),
        F.first("__med").alias("__m"),
        F.first("__mad").alias("__s"),
        F.sum(is_out).alias("n_outliers"),
    )
    return prof.select(
        *by,
        "n",
        F.round(F.col("__m"), decimals).alias("median"),
        F.round(F.col("__s"), decimals).alias("mad"),
        F.coalesce(F.col("n_outliers"), F.lit(0)).alias("n_outliers"),
        F.round(
            F.when(
                F.col("n") > 0,
                F.coalesce(F.col("n_outliers"), F.lit(0))
                / F.col("n").cast("double"),
            ),
            decimals,
        ).alias("outlier_frac"),
    )


def robust_scale(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    suffix: str = "_scaled",
    exact: bool = True,
    relative_error: float = 0.001,
    decimals: int = 6,
) -> DataFrame:
    """Median/IQR feature scaling — ``(x − median) / (p75 − p25)`` per
    group (sklearn's RobustScaler semantics): the standardization that
    survives the outliers a mean/stddev scaler lets define its own
    scale. Input rows + one ``col + suffix`` column per input column;
    a degenerate group (IQR 0 — over half the values identical) scales
    to NULL rather than ±inf, and NULL/NaN inputs stay NULL.

    Scale shape: ONE aggregation pass fits all three quartiles for all
    columns at group cardinality (exact ``percentile`` for the gate,
    KLL ``approx_percentile`` via ``exact=False`` at 100 TB), joined
    back broadcast; scaling is a map-only projection.
    """
    if not cols:
        raise ValueError("robust_scale needs at least one column")
    by = by or []
    fn = (
        F.percentile
        if exact
        else (
            lambda c, p: F.approx_percentile(
                c, p, F.lit(int(1 / relative_error))
            )
        )
    )
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        # NaN exclusion at fit time (the mad_outlier_profile filter,
        # per column): one NaN would otherwise ride the percentile
        # sort as the greatest value, make q75/IQR NaN, and — because
        # NaN > 0 is TRUE under Spark ordering — poison EVERY scaled
        # value in the group through the F.when(iqr > 0) branch.
        x_fit = F.when(~F.isnan(x), x)
        aggs.append(
            fn(x_fit, F.lit([0.25, 0.5, 0.75])).alias(f"__q_{c}")
        )
    stats = df.groupBy(
        *[F.col(g).alias(f"__g_{i}") for i, g in enumerate(by)]
    ).agg(*aggs)
    if by:
        from functools import reduce

        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(g).eqNullSafe(F.col(f"__g_{i}"))
                for i, g in enumerate(by)
            ],
        )
        joined = df.join(F.broadcast(stats), cond, "left")
    else:
        joined = df.crossJoin(F.broadcast(stats))
    out = joined
    for c in cols:
        q = F.col(f"__q_{c}")
        med = F.element_at(q, 2)
        iqr = F.element_at(q, 3) - F.element_at(q, 1)
        x = F.col(c).cast("double")
        out = out.withColumn(
            c + suffix,
            F.round(
                F.when((iqr > 0) & ~F.isnan(x), (x - med) / iqr), decimals
            ),
        )
    return out.drop(
        *[f"__g_{i}" for i in range(len(by))],
        *[f"__q_{c}" for c in cols],
    )
