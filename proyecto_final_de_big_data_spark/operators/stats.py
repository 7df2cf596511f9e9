"""Pairwise Pearson correlation matrix — every column pair in ONE
aggregation pass, long-form output. The first page of any EDA /
feature-selection report ("which of these signals move together?"),
and the multi-column generalization of :mod:`.trend`'s sufficient-
statistics trick.

Scale shape (100 TB): no `df.stat.corr` loop (that is one full pass
PER PAIR), no window, no sample-to-driver. A single ``groupBy``
collects the 6 sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) for
every pair at once with map-side partial aggregation — one shuffle of
6·C(k,2) doubles per group regardless of row count — and the
closed-form corr arithmetic runs at group cardinality. The long-form
explode happens AFTER the aggregation, on answer-scale rows.

NULL policy is pairwise deletion (the `pandas.DataFrame.corr`
convention): a row contributes to a pair's statistics only when BOTH
columns are non-null, so each pair sees its own n. Degenerate pairs
(< 2 complete rows, zero variance on either side) yield NULL, never
NaN or a divide-by-zero — ANSI-safe by construction.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """``(*by, col_x, col_y, n_rows, corr)`` — Pearson r for every
    unordered column pair (col_x < col_y in ``cols`` order), optionally
    per ``by`` group. ``n_rows`` counts rows where both columns are
    non-null (pairwise deletion); ``corr`` is NULL for degenerate
    pairs."""
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least 2 columns")
    by = by or []
    pairs = list(combinations(cols, 2))
    aggs = []
    for i, (cx, cy) in enumerate(pairs):
        x = F.col(cx).cast("double")
        y = F.col(cy).cast("double")
        both = x.isNotNull() & y.isNotNull()
        xv = F.when(both, x)
        yv = F.when(both, y)
        aggs += [
            F.count(xv).cast("double").alias(f"__n_{i}"),
            F.sum(xv).alias(f"__sx_{i}"),
            F.sum(yv).alias(f"__sy_{i}"),
            F.sum(xv * xv).alias(f"__sxx_{i}"),
            F.sum(yv * yv).alias(f"__syy_{i}"),
            F.sum(xv * yv).alias(f"__sxy_{i}"),
        ]
    agg = df.groupBy(*by).agg(*aggs)
    structs = []
    for i, (cx, cy) in enumerate(pairs):
        n = F.col(f"__n_{i}")
        sx, sy = F.col(f"__sx_{i}"), F.col(f"__sy_{i}")
        sxx, syy, sxy = (
            F.col(f"__sxx_{i}"),
            F.col(f"__syy_{i}"),
            F.col(f"__sxy_{i}"),
        )
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        cov = n * sxy - sx * sy
        corr = F.when(
            (n >= 2) & (var_x > 0) & (var_y > 0),
            cov / F.sqrt(var_x * var_y),
        )
        structs.append(
            F.struct(
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                n.cast("long").alias("n_rows"),
                F.round(corr, decimals).alias("corr"),
            )
        )
    return agg.select(
        *by, F.explode(F.array(*structs)).alias("__pair")
    ).select(*by, "__pair.col_x", "__pair.col_y", "__pair.n_rows", "__pair.corr")
