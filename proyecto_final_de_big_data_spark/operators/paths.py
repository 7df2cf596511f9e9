"""Behavioral path analysis: Markov next-event transitions and
sessionized event paths — the "users flow" half of the product-analytics
surface the funnel/retention module (``operators/funnel.py``) started.

Scale shape (100 TB of events): everything is keyed on the
high-cardinality ``user_id`` — ONE user-keyed window pass forms the
consecutive-event pairs, and the transition matrix aggregates at
(event_type × event_type) cardinality, tiny at any corpus size. The
row-normalization runs as a window over that answer-scale matrix, not
over the events. No global order anywhere.

Determinism: within a user, events are ordered by (ts, tiebreak) — a
same-instant pair is ordered by the tiebreak column (the monotone
event id), so every engine forms the identical pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``(from_type, to_type, n_transitions, p_transition)``
    where ``p_transition`` row-normalizes per ``from_type`` (rounded to
    6 decimals). A user's last event emits no pair; transitions never
    cross users.
    """
    from pyspark.sql import Window

    order = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(order).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    # Row-normalize over the (|types| x |types|)-row matrix — an
    # answer-scale window, not a data-scale one.
    row_total = Window.partitionBy("from_type")
    return counts.withColumn(
        "p_transition",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(row_total), 6
        ),
    )


def session_paths(
    events: DataFrame,
    session_cols: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    sep: str = ">",
    max_len: int = 50,
) -> DataFrame:
    """Per-session ordered event path: ``(*session_cols, path,
    n_events)`` with ``path`` the first ``max_len`` event types joined
    by ``sep`` in (ts, tiebreak) order. ``max_len`` caps pathological
    sessions so a runaway key cannot build an unbounded string (the cap
    is applied AFTER ordering, so it is deterministic).

    One session-keyed aggregation: events collect as (ts, tiebreak,
    type) structs, ``array_sort`` orders them inside the group (struct
    comparison is field-order lexicographic — exactly the (ts,
    tiebreak) order), then a codegen'd slice+transform+join builds the
    path. No window, no second shuffle.
    """
    collected = events.groupBy(*session_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(type_col)))
        ).alias("__seq")
    )
    types = F.transform(
        F.slice("__seq", 1, max_len), lambda s: s[type_col]
    )
    return collected.select(
        *[F.col(c) for c in session_cols],
        F.array_join(types, sep).alias("path"),
        F.size("__seq").cast("long").alias("n_events"),
    )
