"""Kaplan-Meier survival estimation — the nonparametric retention /
churn curve ("what fraction of users survive past day t?") with proper
right-censoring, the statistic behind every retention dashboard that
is honest about users who simply have not churned YET.

Input is one row per subject: a numeric duration (time observed) and
an event flag (1 = the terminal event happened at that duration,
0 = right-censored — observation ended with the subject still alive).
The estimator at each distinct event time t_i is

    S(t_i) = Π_{j ≤ i} (1 - d_j / n_j)

with d_j = events at time t_j and n_j = subjects still at risk
(duration ≥ t_j). Censored subjects leave the risk set without
contributing an event — dropping them instead (the naive "filter to
churned users" curve) biases survival DOWN, which is exactly the
mistake this operator exists to avoid.

Scale shape (100 TB): one ``groupBy(duration)`` aggregation collapses
the subject table to at most |distinct durations| rows per group —
answer-scale (days/weeks, not subjects) — and every window below runs
over THAT frame, not the subjects. The running product is computed as
``exp(Σ ln(1 - d/n))`` over answer-scale rows so it stays a single
cumulative window, with an explicit absorbing-zero flag for the
``d == n`` boundary (ln(0) is NULL under Spark and an error under
ANSI-strict engines — the flag keeps both sides of the oracle exact).
When ``by`` is empty the single cumulative window is a one-partition
sort over answer-scale rows — bounded by the duration domain, never
by subject count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """``(*by, duration, n_at_risk, n_events, n_censored, survival)``
    — the KM curve at each distinct duration present in the group (one
    row per duration, event times and censoring-only times alike;
    censoring-only rows carry the unchanged running survival).
    ``event_col`` must be 0/1."""
    by = by or []
    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("long")
    per_t = (
        # NULL/NaN durations are excluded up front (ADVICE r7): a NULL
        # duration would otherwise form its own group that sorts FIRST
        # under the cumulative windows, silently skewing n_at_risk and
        # the survival product for the whole group. A subject with no
        # observed duration carries no survival information.
        df.filter(dur.isNotNull() & ~F.isnan(dur))
        .select(*by, dur.alias("duration"), ev.alias("__ev"))
        .groupBy(*by, "duration")
        .agg(
            F.sum("__ev").alias("n_events"),
            F.sum(F.lit(1) - F.col("__ev")).alias("n_censored"),
        )
    )
    w_all = Window.partitionBy(*by)
    w_cum = (
        Window.partitionBy(*by)
        .orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.partitionBy(*by)
        .orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w_all)
    removed = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev), F.lit(0)
    )
    curve = per_t.withColumn("n_at_risk", total - removed)
    d = F.col("n_events").cast("double")
    n = F.col("n_at_risk").cast("double")
    # factor ln(1 - d/n), stated as ln((n-d)/n) so the subtraction is
    # integer-exact; only rows with an event AND a surviving remainder
    # contribute (d == 0 -> factor 1 -> ln 1 = 0; d == n -> absorbing 0).
    logf = F.when((d > 0) & (d < n), F.log((n - d) / n))
    absorbed = F.max(
        F.when(F.col("n_events") >= F.col("n_at_risk"), 1).otherwise(0)
    ).over(w_cum)
    survival = F.when(absorbed == 1, F.lit(0.0)).otherwise(
        F.exp(F.coalesce(F.sum(logf).over(w_cum), F.lit(0.0)))
    )
    return curve.select(
        *by,
        "duration",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.round(survival, decimals).alias("survival"),
    )
