"""Rolling active-user engagement: DAU / trailing-window WAU-style
distinct actives and the DAU/WAU "stickiness" ratio — the standard
product-engagement readout, generalized over the reference's
count-by-hour/dow marts (scripts/03_spark_eda_agg.py:58-86) per
SURVEY §8's behavioral inventory.

The naive formulation is ``count(DISTINCT user) OVER (ORDER BY day
RANGE 6 PRECEDING)`` — but distinct doesn't decompose over sliding
windows, so engines either reject it or recompute each window from
scratch over raw rows. The distributed shape here:

1. dedup to the (user, active-day) frame — ONE distinct shuffle over
   the event log's projection, after which everything is
   user-day-cardinality, not event-cardinality;
2. EXPAND each (user, day) to the ``window_days`` target days it keeps
   the user "active" for (map-side sequence/explode — a fixed small
   multiplier, no shuffle);
3. dedup (user, target-day) and count per target day.

At extreme scale step 3's distinct can flip to the HLL sketch
(:mod:`.sketches`) — documented approx path; this operator is the
exact one, which is what a SQL oracle can restate (as a range join —
deliberately different algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """``(day, dau, wau, stickiness)`` for every day with any
    activity: ``dau`` = distinct users that day, ``wau`` = distinct
    users over the trailing ``window_days`` (that day inclusive),
    ``stickiness`` = dau/wau — 1.0 means every window-active user was
    active today. Only days present in the data are emitted (a silent
    zero-DAU day would be indistinguishable from missing data; gap
    filling is :mod:`.timegrid`'s job). NULL users/timestamps are
    excluded.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    u, t = F.col(user_col), F.col(ts_col)
    ud = (
        df.filter(u.isNotNull() & t.isNotNull())
        .select(u.alias("user"), F.to_date(t).alias("d"))
        .distinct()
    )
    targets = ud.select(
        "user",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("day"),
    )
    active_days = ud.select(F.col("d").alias("day")).distinct()
    wau = (
        targets.join(active_days, "day", "left_semi")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau"), decimals
            ).alias("stickiness"),
        )
    )
