"""Concentration / inequality profile — the Lorenz curve and Gini
coefficient of a value column: "what share of total tokens comes from
the heaviest documents?", "how skewed is spend across customers?".
For a training-data pipeline this is the corpus-concentration
diagnostic that decides whether source caps (:mod:`.mixing`) and
heavy-hitter handling (:mod:`.heavy_hitters`) are even needed.

Scale shape (100 TB): the exact Gini needs every value ranked — a
global sort. Like :func:`..ml.evaluation.roc_auc`, quantizing values
into ``n_buckets`` fixed-width cells makes the curve answer-scale: ONE
map-side-combined ``groupBy(bucket)``, then cumulative population and
value shares walk the ≤n_buckets Lorenz points on one answer-scale
partition. Within-bucket ties contribute their trapezoid exactly, so
the bucketed Gini equals the exact Gini for any distribution that is
constant within cells and converges at O(1/n_buckets) otherwise.

Determinism: bucket assignment is pure IEEE arithmetic; cumulative
counts/sums aggregate longs and per-bucket doubles whose final
rounding absorbs summation-order noise — restatable by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lorenz_gini(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """One row per non-empty bucket, ascending value order:
    ``(bucket, n, sum_v, cum_pop_share, cum_value_share, gini)`` —
    ``(cum_pop_share, cum_value_share)`` are the Lorenz points and
    ``gini`` (identical on every row; kept per-row so the frame stays
    self-describing) is ``1 − Σ (pop_share_b · (L_{b−1} + L_b))`` — the
    trapezoidal area identity. Negative values are rejected (the
    Lorenz construction assumes a non-negative measure); NULLs are
    excluded.
    """
    if hi <= lo:
        raise ValueError(f"need hi > lo, got lo={lo}, hi={hi}")
    if lo < 0:
        raise ValueError(
            f"Lorenz/Gini needs a non-negative measure; lo={lo} < 0"
        )
    from .binning import fixed_width_bucket

    v = F.col(value_col).cast("double")
    # A negative value silently clamped into bucket 0 would corrupt the
    # Lorenz monotonicity — hard-fail instead of summing it.
    b = F.when(
        v < 0,
        F.raise_error(
            F.format_string(
                "lorenz_gini: negative value in %s — the Lorenz "
                "construction needs a non-negative measure",
                F.lit(value_col),
            )
        ).cast("long"),
    ).otherwise(fixed_width_bucket(v, lo, hi, n_buckets))
    cells = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(b.alias("bucket"), v.alias("__v"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__v").alias("sum_v"))
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        cells.withColumn("__tn", F.sum("n").over(w_all))
        .withColumn("__tv", F.sum("sum_v").over(w_all))
        .withColumn("__cn", F.sum("n").over(w_cum))
        .withColumn("__cv", F.sum("sum_v").over(w_cum))
    )
    pop_share = F.col("n") / F.col("__tn").cast("double")
    # An all-zero measure is legal (only negatives are rejected):
    # guard the value-share denominators so it reads as NULL shares,
    # not an ANSI DIVIDE_BY_ZERO.
    tv = F.when(F.col("__tv") != 0, F.col("__tv"))
    l_cur = F.col("__cv") / tv
    l_prev = (F.col("__cv") - F.col("sum_v")) / tv
    # Gini = 1 − Σ_b pop_share_b · (L_{b−1} + L_b); the sum is another
    # unpartitioned window over the ≤n_buckets-row frame.
    gini = F.lit(1.0) - F.sum(pop_share * (l_prev + l_cur)).over(w_all)
    return cum.select(
        "bucket",
        "n",
        F.round("sum_v", decimals).alias("sum_v"),
        F.round(F.col("__cn") / F.col("__tn").cast("double"), decimals).alias(
            "cum_pop_share"
        ),
        F.round(l_cur, decimals).alias("cum_value_share"),
        F.round(gini, decimals).alias("gini"),
    )
