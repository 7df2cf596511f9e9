"""Shared per-key series collection for the sequential-recursion
operators (:mod:`.anomaly` EWMA, :mod:`.changepoint` CUSUM): gather
each key's (t, x) points into ONE sorted in-memory array so an
inherently order-dependent recursion can run as a bounded fold —
O(n) per key, embarrassingly parallel across keys, zero driver state.

The guardrails live here once: NULL/NaN values are excluded up front
(one poisoned cell would otherwise NULL every fold state after it),
and ``max_points`` hard-fails on runaway keys instead of OOMing an
executor (the :mod:`.sessionize` discipline — aggregate to a coarser
grid or raise the cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_sorted_series(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    max_points: int,
    op_name: str,
) -> DataFrame:
    """One row per key with ``__pts`` = array<struct<t, x:double>>
    sorted by (t, x) — struct lexicographic order IS the series order.
    NULL/NaN values are excluded; a key exceeding ``max_points`` raises
    at evaluation time with ``op_name`` in the message."""
    if not key_cols:
        raise ValueError(f"{op_name} needs at least one key column")
    v = F.col(value_col).cast("double")
    arr = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(t_col).alias("t"), v.alias("x"))
                )
            ).alias("__pts")
        )
    )
    return arr.withColumn("__n", F.size("__pts")).withColumn(
        "__pts",
        F.when(F.col("__n") <= F.lit(max_points), F.col("__pts")).otherwise(
            F.raise_error(
                F.format_string(
                    "%s: key series exceeds max_points=%d — aggregate to "
                    "a coarser grid or raise the cap",
                    F.lit(op_name),
                    F.lit(max_points),
                )
            )
        ),
    )
