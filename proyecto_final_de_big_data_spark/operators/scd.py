"""Slowly-changing-dimension (Type 2) history from periodic snapshots.

A warehouse ingesting full dimension snapshots (daily customer table,
monthly supplier file) wants the HISTORY table: one row per (key,
consecutive run of identical attributes) with a validity interval —
the shape the engine's as-of and interval joins (``operators/asof.py``)
then consume for time-travel lookups.

Scale shape: one window pass keyed on the dimension key (change-point
detection via ``lag`` + running version counter), then a (key, version)
aggregation and a second window for the interval's exclusive end — all
three share the same key partitioning, so the plan carries ONE real
shuffle of the (already projected) key+attr+snapshot columns. The
attribute comparison is NULL-safe via the shared ``content_digest``
(the same identity the dedup family uses), so ``NULL -> 'x'`` is a
change and ``NULL -> NULL`` is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import content_digest


def scd2_from_snapshots(
    df: DataFrame,
    key_cols: list[str] | str,
    attr_cols: list[str],
    snapshot_col: str,
) -> DataFrame:
    """Collapse snapshot rows into SCD Type-2 validity intervals.

    Input: one row per (key, snapshot) — e.g. the dimension as observed
    at each load. Output: one row per (key, unchanged-attribute run)
    with ``valid_from`` (first snapshot showing these attributes),
    ``valid_to`` (the NEXT run's first snapshot — exclusive — or NULL
    for the current run) and ``is_current``.

    Duplicate (key, snapshot) rows are a data error this operator
    refuses to guess about: the change detector orders by snapshot, and
    two rows at the same instant have no defined 'before'. They surface
    as a ``version`` collision aggregated into one row; callers wanting
    loud failure should dedup upstream.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = content_digest(attr_cols)
    w = Window.partitionBy(*keys).orderBy(snapshot_col)
    # Change at the first row of a key or whenever the digest differs
    # from the previous snapshot (NULL-safe: digest is never NULL).
    prev = F.lag(d).over(w)
    changed = (prev.isNull() | (prev != d)).cast("long")
    versioned = df.withColumn("__ver", F.sum(changed).over(w))
    runs = versioned.groupBy(*keys, "__ver").agg(
        *[F.first(a).alias(a) for a in attr_cols],
        F.min(snapshot_col).alias("valid_from"),
    )
    w_runs = Window.partitionBy(*keys).orderBy("valid_from")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__ver")
        .select(*keys, *attr_cols, "valid_from", "valid_to", "is_current")
    )
