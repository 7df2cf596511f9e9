"""Skew-mitigation operators for hot keys at scale.

AQE's skew-join handling (enabled in the session factory) covers most
cases at runtime; these operators are the explicit variants for when the
skew is known ahead of time (e.g. the "desconocido" default key that the
reference's stringly-typed ID columns concentrate — SURVEY §7 risks —
or a boilerplate dedup bucket).

- ``salted_aggregate``: two-phase aggregation — groupBy (key, salt)
  partial, then groupBy key final — spreads one hot key over N
  reducers. Works for algebraic aggregates (sum/count/min/max; avg via
  sum+count recombination).
- ``salted_broadcast_left``: replicate the broadcast side per salt so a
  skewed probe side still joins locally (no shuffle of the big side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column] | None = None,
    count_alias: str | None = "n",
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted partial → final) sum/count aggregation.

    ``sums`` maps output alias -> column expression to sum. The salt is
    uniform random per row — phase 1 shuffles on (keys, salt), phase 2
    combines the ≤ n_salts partials per key, so no single reducer sees a
    whole hot key.
    """
    sums = sums or {}
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial_aggs = [F.sum(expr).alias(f"__p_{alias}") for alias, expr in sums.items()]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__p_cnt"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"__p_{alias}").alias(alias) for alias in sums]
    if count_alias:
        final_aggs.append(F.sum("__p_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Equi-join big ⋈ small on ``key`` with the small side replicated
    per salt and broadcast — the big (skewed) side never shuffles."""
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(F.broadcast(replicated), [key, "__salt"], "inner").drop("__salt")
