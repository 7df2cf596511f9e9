"""Experiment (A/B test) analysis: two-proportion z-test over per-unit
conversion flags — the readout every experimentation dashboard runs on
top of an event store.

Everything is closed-form arithmetic over TWO group aggregates (count +
success count), so the whole readout is one aggregation pass at
group cardinality and is exactly restatable in ANSI SQL — the gate
hash-matches the z statistic and the confidence interval, not just the
counts. No sampling, no simulation, no SciPy.

Scale shape: the per-unit frame (one row per experiment unit with its
variant and 0/1 outcome) is produced upstream by a user-keyed
aggregation over events; this module then reduces it to ONE row. The
z-test itself is O(groups) — free at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_proportion_ztest(
    units: DataFrame,
    group_col: str,
    success_col: str,
    control: str,
    treatment: str,
    z_crit: float = 1.959963984540054,  # 95% two-sided normal quantile
) -> DataFrame:
    """One-row two-proportion z-test readout comparing ``treatment``
    against ``control``:

    ``(n_control, conv_control, n_treatment, conv_treatment,
    rate_control, rate_treatment, abs_lift, z_stat, ci_low, ci_high,
    significant)``

    - ``z_stat`` uses the pooled-variance form (the standard test
      statistic under H0: p_c == p_t);
    - the CI on the rate difference uses the UNpooled Wald standard
      error (the standard interval form), at the quantile ``z_crit``;
    - ``significant`` flags |z| > z_crit.

    Rates/lift/z/CI are rounded to 6 decimals so engines agree to the
    hash. Raises upfront if either group is empty — a z-test over a
    missing arm is meaningless, not zero.
    """
    s = F.col(success_col).cast("int")
    g = F.col(group_col)
    agg = units.agg(
        F.coalesce(F.sum(F.when(g == control, 1).otherwise(0)), F.lit(0)).alias("n_c"),
        F.coalesce(F.sum(F.when(g == control, s).otherwise(0)), F.lit(0)).alias("x_c"),
        F.coalesce(F.sum(F.when(g == treatment, 1).otherwise(0)), F.lit(0)).alias("n_t"),
        F.coalesce(F.sum(F.when(g == treatment, s).otherwise(0)), F.lit(0)).alias("x_t"),
    )
    x_c, x_t = F.col("x_c").cast("double"), F.col("x_t").cast("double")
    # NULL-when-zero denominators: under ANSI mode a 0-unit arm would
    # raise DIVIDE_BY_ZERO inside the plan before the friendly
    # validation below ever ran; dividing by NULL instead yields NULL
    # and lets the empty-arm check report properly.
    n_c = F.when(F.col("n_c") > 0, F.col("n_c").cast("double"))
    n_t = F.when(F.col("n_t") > 0, F.col("n_t").cast("double"))
    checked = agg.select(
        "*",
        F.when(
            (F.col("n_c") == 0) | (F.col("n_t") == 0), F.lit(None)
        ).otherwise(F.lit(1)).alias("__arms_ok"),
    )
    p_c, p_t = x_c / n_c, x_t / n_t
    pooled = (x_c + x_t) / (n_c + n_t)
    se_pooled = F.sqrt(pooled * (1.0 - pooled) * (1.0 / n_c + 1.0 / n_t))
    se_wald = F.sqrt(p_c * (1.0 - p_c) / n_c + p_t * (1.0 - p_t) / n_t)
    diff = p_t - p_c
    z = F.when(se_pooled > 0, diff / se_pooled).otherwise(F.lit(0.0))
    out = checked.select(
        F.col("n_c").alias("n_control"),
        F.col("x_c").alias("conv_control"),
        F.col("n_t").alias("n_treatment"),
        F.col("x_t").alias("conv_treatment"),
        F.round(p_c, 6).alias("rate_control"),
        F.round(p_t, 6).alias("rate_treatment"),
        F.round(diff, 6).alias("abs_lift"),
        F.round(z, 6).alias("z_stat"),
        F.round(diff - F.lit(z_crit) * se_wald, 6).alias("ci_low"),
        F.round(diff + F.lit(z_crit) * se_wald, 6).alias("ci_high"),
        (F.abs(z) > F.lit(z_crit)).cast("int").alias("significant"),
        "__arms_ok",
    )
    # One pass: evaluate the (Spark-side, hash-exact) arithmetic once,
    # validate, and rehydrate the single answer row — callers' actions
    # then never rescan the units frame.
    row = out.collect()[0]
    if row["__arms_ok"] is None:
        raise ValueError(
            f"two_proportion_ztest needs units in BOTH arms; got "
            f"control={control!r} n={int(row['n_control'])}, "
            f"treatment={treatment!r} n={int(row['n_treatment'])}"
        )
    spark = units.sparkSession
    names = [c for c in out.columns if c != "__arms_ok"]
    return spark.createDataFrame(
        [tuple(row[c] for c in names)],
        "n_control long, conv_control long, n_treatment long, "
        "conv_treatment long, rate_control double, rate_treatment double, "
        "abs_lift double, z_stat double, ci_low double, ci_high double, "
        "significant int",
    )
