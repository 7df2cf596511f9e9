"""Gap-filled time-series grids (dense bucket axis with zero-fill).

A grouped time-bucket aggregation silently drops empty buckets; charts
and downstream window math need the dense axis. The grid is generated
from a one-row min/max aggregate (``sequence`` + ``explode``) — bucket
counts, not raw rows, so at 100 TB the grid side is tiny (hours in a
year ≈ 8.8k rows) and joins against the already-aggregated counts; the
corpus is touched exactly once by the groupBy scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gap_filled_counts(
    df: DataFrame,
    ts_col: str = "ts",
    grain: str = "hour",
    value_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Dense per-``grain`` counts (and optional value sums, rounded to 6
    decimals) with empty buckets present as zeros.

    Returns columns: ``bucket`` (timestamp), ``n_events`` (bigint),
    and ``sum_value`` when ``value_col`` is given.

    The aggregate is referenced twice (bounds + the grid join) and
    Spark does NOT unify the two subplans (their column pruning
    differs, so no ReusedExchange). Default: persist the
    bucket-count-sized aggregate so the corpus is genuinely read once,
    eagerly materialize the (equally small) gap-filled result, release
    the cache. ``materialize=False`` returns the lazy plan (plan
    inspection / composition; the caller owns caching).
    min(date_trunc(ts)) == date_trunc(min(ts)), so deriving bounds
    from the aggregate leaves the grid identical either way.
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    counts = df.groupBy(bucket.alias("bucket")).agg(*aggs)
    if materialize:
        counts = counts.persist()
    bounds = counts.agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.expr(f"interval 1 {grain}"))
        ).alias("bucket")
    )
    out = grid.join(counts, "bucket", "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0))
    )
    if value_col is not None:
        out = out.withColumn("sum_value", F.coalesce(F.col("sum_value"), F.lit(0.0)))
    if not materialize:
        return out
    from ..utils.caching import materialize_and_release

    return materialize_and_release(out, counts)
