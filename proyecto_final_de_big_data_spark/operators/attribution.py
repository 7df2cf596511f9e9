"""Multi-touch conversion attribution (first / last / linear credit).

The marketing-analytics classic: every conversion event distributes
credit over the touch events that preceded it in the same user's
stream — all of the credit to the first touch, all to the last, or
1/n to each (linear). Deterministic set algebra, no model fitting.

Group formation avoids a range join entirely: one user-keyed window
pass counts conversions at-or-after each row (a reverse cumulative
sum), which assigns every touch to the NEXT conversion — same-group
rows share that count. Within a group the first/last touch is an
argmin/argmax by (ts, id) — exact, tie-broken, restatable in SQL.

Scale shape (100 TB): ONE window over (user, ts) — high-cardinality
partition key, bounded per-user frames — then credit aggregation at
(user, group) cardinality and a final channel-keyed rollup of a few
doubles per channel. Conversions with no preceding touch earn no
credit row anywhere — recover their count externally as
``count(conversions) − sum(first_touch)``, which is exact because
every attributed conversion credits exactly one first touch; touches
after a user's final conversion attach to nothing and drop out.

Extension surface — the reference has no behavioral attribution stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversion_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: list[str],
    decimals: int = 6,
) -> DataFrame:
    """``(channel, n_touches, first_touch, last_touch, linear_credit)``
    — one row per touch channel.

    ``first_touch``/``last_touch`` count conversions credited wholly to
    the channel under each model; ``linear_credit`` sums 1/n over each
    conversion's n touches. A touch at exactly the conversion's
    timestamp attaches to it (<= semantics via ordering touches before
    conversions at equal ts); ties inside a group break on (ts, id).
    """
    if not touch_types:
        raise ValueError("conversion_attribution needs touch_types")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("channel"),
        # native id type: a cast("long") would RAISE on string/UUID ids
        # under ANSI (Spark 4 default) and NULL them otherwise, silently
        # breaking the (ts, eid) tie-break uniqueness contract.
        F.col(id_col).alias("eid"),
        (F.col(type_col) == conversion_type).cast("int").alias("is_conv"),
    ).filter(
        (F.col("channel") == conversion_type)
        | F.col("channel").isin(list(touch_types))
    )
    # Reverse cumulative conversion count: rows sharing the value belong
    # to the same conversion group (the conversion row included). Touches
    # sort before a same-ts conversion so <= attachment holds.
    w_rev = (
        Window.partitionBy("u")
        .orderBy(F.col("ts"), F.col("is_conv"), F.col("eid"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    touches = ev.withColumn("grp", F.sum("is_conv").over(w_rev)).filter(
        (F.col("grp") > 0)  # rows after the user's last conversion drop
        & (F.col("is_conv") == 0)
    )
    # ONE linear pipeline — no branch ever re-evaluates the event-scale
    # window (the funnel_counts lesson, operators/funnel.py): collapse
    # to (user, group, channel), derive the group-level stats with a
    # second window over the already-tiny group partitions, then roll
    # up per channel in a single aggregation.
    base = touches.groupBy("u", "grp", "channel").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.min(F.struct("ts", "eid")).alias("mn"),
        F.max(F.struct("ts", "eid")).alias("mx"),
    )
    w_grp = Window.partitionBy("u", "grp")
    enriched = (
        base.withColumn("n_t", F.sum("cnt").over(w_grp))
        .withColumn("g_mn", F.min("mn").over(w_grp))
        .withColumn("g_mx", F.max("mx").over(w_grp))
    )
    # (ts, eid) is unique per row, so the group min/max identifies
    # exactly one channel row — the first/last touch.
    return enriched.groupBy("channel").agg(
        F.sum("cnt").cast("long").alias("n_touches"),
        F.sum((F.col("mn") == F.col("g_mn")).cast("long")).alias(
            "first_touch"
        ),
        F.sum((F.col("mx") == F.col("g_mx")).cast("long")).alias(
            "last_touch"
        ),
        F.round(F.sum(F.col("cnt") / F.col("n_t")), decimals).alias(
            "linear_credit"
        ),
    )
