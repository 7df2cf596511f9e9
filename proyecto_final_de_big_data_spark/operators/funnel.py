"""Behavioral analytics over event streams: strict-order funnels and
weekly retention cohorts — the two dashboard staples every
product-analytics engine ships (Amplitude/Mixpanel territory),
expressed as plain shuffled-on-the-user-key DataFrame plans.

Scale shape (100 TB of events): every stage is keyed on the
high-cardinality ``user_id`` — per-user min aggregations and user-
keyed equi-joins, so work distributes by user and no stage needs a
global order. The funnel's step tables shrink monotonically (step k+1
joins only users who completed step k), so later joins are smaller,
never bigger. Retention reuses ONE user-key shuffle for the cohort
window and then aggregates at (cohort, offset) cardinality —
weeks², tiny.

Determinism: timestamps compare strictly (a same-instant pair does
NOT advance a strict funnel), and week indices are integer epoch-
division (``epoch_seconds // 604800``) so every engine lands on the
same week with no timezone/locale week-start semantics involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_SECONDS = 7 * 24 * 3600


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict sequential funnel: a user completes step k+1 only with an
    event of that type STRICTLY AFTER their earliest completion of
    step k. Returns one row per step: (step_idx, step, n_users) —
    n_users is monotonically non-increasing by construction."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    spark = events.sparkSession
    # Earliest completion time per user, per step, built iteratively:
    # step 0 is a plain min; step k filters to events after the user's
    # step k-1 time (user-keyed equi-join) before taking the min.
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    counts = [reached.count()]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(reached.select(user_col, "__t"), user_col)
            .filter(F.col(ts_col) > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        reached = nxt
        counts.append(reached.count())
    rows = [(i, s, int(n)) for i, (s, n) in enumerate(zip(steps, counts))]
    return spark.createDataFrame(rows, "step_idx int, step string, n_users long")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted once per later week they return. Returns
    (cohort_week, week_offset, n_users) with week indices as integer
    epoch-weeks — engine-portable, no week-start semantics."""
    from pyspark.sql import Window

    week = (
        F.unix_timestamp(F.col(ts_col)) / F.lit(WEEK_SECONDS)
    ).cast("long")
    w = Window.partitionBy(user_col)
    staged = events.select(
        F.col(user_col), week.alias("__week")
    ).withColumn("__cohort", F.min("__week").over(w))
    return (
        staged.select(user_col, "__cohort", "__week")
        .distinct()
        .groupBy(
            F.col("__cohort").alias("cohort_week"),
            (F.col("__week") - F.col("__cohort")).alias("week_offset"),
        )
        .agg(F.count_distinct(user_col).alias("n_users"))
    )
