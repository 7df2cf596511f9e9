"""Incremental aggregate maintenance — refresh a pre-aggregated mart
from a delta batch WITHOUT rescanning the base facts. The 100-TB mart
problem: the daily KPI rollup reads 100 TB once; tomorrow's refresh
should read yesterday's grain-cardinality snapshot plus today's delta,
never the facts again.

The trick is to keep the mart in *mergeable sufficient-statistic* form
(n, Σx, Σx², min, max per key — the same additivity that powers
:mod:`.crossval` and :func:`.stats.jackknife_ratio`): then
``refreshed = re-aggregate(snapshot ∪ delta_snapshot)`` is ONE shuffle
at grain cardinality. Deletions/corrections ride the same path as
negated rows (n = -1, sums negated) — but min/max are NOT
retraction-safe (dropping the current min needs the runner-up), so
:func:`merge_snapshots` only carries them when ``insert_only=True``.

Derived measures (mean, stddev, …) are VIEWS over the statistics
(:func:`snapshot_stats`), computed at read time — never stored, so
they are always consistent with the merged state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STAT_COLS = ("n", "sum_v", "sum_v2", "min_v", "max_v")


def agg_snapshot(
    df: DataFrame, keys: list[str], value_col: str, weight: int = 1
) -> DataFrame:
    """Aggregate raw facts to the mergeable snapshot grain:
    ``(*keys, n, sum_v, sum_v2, min_v, max_v)``. ``weight=-1`` turns a
    batch of deletions into a retraction snapshot (counts and sums
    negate; min/max stay positive facts and must be ignored by an
    insert_only=False merge)."""
    v = F.col(value_col).cast("double")
    w = F.lit(weight)
    return df.groupBy(*keys).agg(
        (F.count(v) * w).cast("long").alias("n"),
        (F.sum(v) * w).alias("sum_v"),
        (F.sum(v * v) * w).alias("sum_v2"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_snapshots(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    insert_only: bool = True,
) -> DataFrame:
    """Union-and-reaggregate merge of two snapshots at the same grain —
    ONE shuffle whose input is grain-cardinality on both sides (the
    base facts are never touched). Keys whose merged ``n`` reaches 0
    disappear (full retraction). With ``insert_only=False`` min/max are
    dropped from the output: they are not retraction-safe statistics,
    and silently keeping a stale min is the classic incremental-view
    bug."""
    cols = [*keys, *_STAT_COLS]
    if insert_only:
        missing = [
            c
            for c in ("min_v", "max_v")
            for side in (snapshot, delta)
            if c not in side.columns
        ]
        if missing:
            raise ValueError(
                "merge_snapshots(insert_only=True) needs min_v/max_v on "
                "both sides; an input produced by a retraction merge has "
                "dropped them — continue with insert_only=False"
            )
    else:
        # A retraction-mode output has no min/max (not retraction-safe),
        # and must itself be mergeable next refresh: select only the
        # additive statistics from both sides.
        cols = [*keys, "n", "sum_v", "sum_v2"]
    unioned = snapshot.select(*cols).unionByName(delta.select(*cols))
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.sum("sum_v2").alias("sum_v2"),
    ]
    if insert_only:
        aggs += [F.min("min_v").alias("min_v"), F.max("max_v").alias("max_v")]
    return unioned.groupBy(*keys).agg(*aggs).filter(F.col("n") != 0)


def snapshot_stats(snap: DataFrame, keys: list[str], decimals: int = 6) -> DataFrame:
    """Read-time derived measures over a snapshot: ``(*keys, n, sum_v,
    mean_v, std_v [, min_v, max_v])``. Population stddev from the
    moment form, clamped at 0 against cancellation noise; single-row
    groups yield std 0, empty/negative-n groups NULL."""
    nd = F.col("n").cast("double")
    mean = F.when(F.col("n") > 0, F.col("sum_v") / nd)
    var = F.when(
        F.col("n") > 0,
        F.greatest(
            F.col("sum_v2") / nd - F.pow(F.col("sum_v") / nd, 2), F.lit(0.0)
        ),
    )
    out = [
        *keys,
        F.col("n"),
        F.round("sum_v", decimals).alias("sum_v"),
        F.round(mean, decimals).alias("mean_v"),
        F.round(F.sqrt(var), decimals).alias("std_v"),
    ]
    if "min_v" in snap.columns:
        out += [
            F.round("min_v", decimals).alias("min_v"),
            F.round("max_v", decimals).alias("max_v"),
        ]
    return snap.select(*out)
