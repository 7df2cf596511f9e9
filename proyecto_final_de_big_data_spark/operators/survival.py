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


def _risk_table(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by: list[str],
):
    """Shared risk-table stage of both estimators: the
    ``(*by, duration, n_events, n_censored, n_at_risk)`` frame at
    duration-grid cardinality, plus the cumulative window over it.
    Returns ``(curve, w_cum)``."""
    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("long")
    per_t = (
        # NULL/NaN durations are excluded up front (ADVICE r7): a NULL
        # duration would otherwise form its own group that sorts FIRST
        # under the cumulative windows, silently skewing n_at_risk and
        # the running statistic for the whole group. A subject with no
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
    return per_t.withColumn("n_at_risk", total - removed), w_cum


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
    curve, w_cum = _risk_table(df, duration_col, event_col, by)
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


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """``(*by, duration, n_at_risk, n_events, n_censored, cum_hazard,
    var_hazard, survival_fh)`` — the Nelson–Aalen cumulative-hazard
    estimator at each distinct duration (Nelson, Technometrics 1972;
    Aalen, Ann. Stat. 1978 — public literature), sharing
    :func:`kaplan_meier`'s risk-table machinery:

        H(t) = Σ_{t_j ≤ t} d_j / n_j          (cumulative hazard)
        Var  = Σ_{t_j ≤ t} d_j / n_j²         (Aalen's estimator)
        S_FH = exp(−H)                        (Fleming–Harrington)

    The hazard-scale twin of the KM curve: H is ADDITIVE, so
    epoch-over-epoch hazard increments subtract cleanly (the "how
    much churn pressure did week 6 add" readout KM's product form
    obscures), and S_FH = exp(−H) is the Fleming–Harrington survival
    estimate — close to KM everywhere, but it never hits an absorbing
    zero when d == n (exp(−H) stays positive; KM goes exactly 0 — the
    documented estimator difference, not a bug). Censoring-only rows
    add 0 hazard and carry the running values. ``event_col`` must be
    0/1.

    All arithmetic is integer-count ratios summed in the cumulative
    window's DETERMINISTIC duration order — no accumulation-order
    ambiguity at all, unlike free-form float sums.

    Scale shape (100 TB): identical to :func:`kaplan_meier` — one
    subject-to-grid aggregation, every window over the answer-scale
    duration grid (when ``by`` is empty the single-partition window is
    bounded by the duration domain, never subjects).

    Extension surface — the reference has no survival stage; extension
    per SURVEY §8, the hazard-scale sibling of :func:`kaplan_meier`.
    """
    by = by or []
    curve, w_cum = _risk_table(df, duration_col, event_col, by)
    d = F.col("n_events").cast("double")
    n = F.col("n_at_risk").cast("double")
    term = F.when(F.col("n_events") > 0, d / n).otherwise(F.lit(0.0))
    vterm = F.when(F.col("n_events") > 0, d / (n * n)).otherwise(F.lit(0.0))
    h = F.sum(term).over(w_cum)
    v = F.sum(vterm).over(w_cum)
    return curve.select(
        *by,
        "duration",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.round(h, decimals).alias("cum_hazard"),
        F.round(v, decimals).alias("var_hazard"),
        F.round(F.exp(-h), decimals).alias("survival_fh"),
    )
