"""Value binning via a when-chain (SURVEY §2.9 F5; reference A9
``scripts/03_spark_eda_agg.py:127-144``): label + sort ordinal columns.

A when-chain is a single codegen'd expression — cheaper than
``Bucketizer`` (no ML metadata, no extra projection) and identical to a
SQL CASE for the oracle. Bins are left-open, right-closed:
``value <= edges[i]`` picks label i; above the last edge picks the
overflow label.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_expr(col: str, edges: list[float], labels: list[str]) -> tuple[Column, Column]:
    """Return (label_column, ordinal_column) for a when-chain binning."""
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    label_expr: Column | None = None
    order_expr: Column | None = None
    for i, edge in enumerate(edges):
        cond = F.col(col) <= edge
        label_expr = F.when(cond, labels[i]) if label_expr is None else label_expr.when(cond, labels[i])
        order_expr = F.when(cond, i) if order_expr is None else order_expr.when(cond, i)
    assert label_expr is not None and order_expr is not None
    return label_expr.otherwise(labels[-1]), order_expr.otherwise(len(edges))


def with_bin(
    df: DataFrame, col: str, edges: list[float], labels: list[str], label_col: str = "bin", order_col: str = "bin_order"
) -> DataFrame:
    label, order = bin_expr(col, edges, labels)
    return df.withColumn(label_col, label).withColumn(order_col, order)


def equal_frequency_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    bin_col: str = "bin",
    exact: bool = True,
    relative_error: float = 0.001,
) -> tuple[DataFrame, list[float]]:
    """Bin ``col`` into ``n_bins`` equal-frequency buckets (deciles at
    the default) via quantile BOUNDS, not a global sort.

    The naive equal-frequency formulation is ``ntile(n) OVER (ORDER BY
    col)`` — a total order over the corpus, which funnels 100 TB
    through one sort. Here one aggregation pass computes the n-1
    interior quantile bounds (answer-scale driver state), and binning
    is a map-only chain of ``value > bound`` comparisons — no shuffle
    of the data at all; callers aggregate the result however they like.

    ``exact=True`` uses ``percentile`` (exact linear-interpolation
    bounds — same definition as DuckDB's ``quantile_cont``, which is
    what makes the gate hash-comparable); production at 100 TB flips
    to ``exact=False`` for the one-pass ``approx_percentile`` sketch,
    trading bound exactness (never bin-count correctness AROUND the
    returned bounds) for a bounded-memory merge. Ties sit with the
    LOWER bin (strict ``>``), matching the left-open/right-closed
    convention of :func:`bin_expr`.

    Returns ``(df + bin_col [0..n_bins-1], bounds)``.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    fracs = [i / n_bins for i in range(1, n_bins)]
    fn = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, F.lit(int(1 / relative_error)))
    )
    bounds = df.agg(fn(F.col(col), F.lit(fracs)).alias("b")).collect()[0]["b"]
    if bounds is None:
        # percentile over zero non-NULL values aggregates to NULL —
        # raise a named error instead of an opaque iteration TypeError.
        raise ValueError(
            f"equal_frequency_bins: no non-NULL values in {col!r} to fit "
            "quantile bounds on (empty or all-NULL frame)"
        )
    bounds = [float(b) for b in bounds]
    return bin_by_bounds(df, col, bounds, bin_col), bounds


def bin_by_bounds(
    df: DataFrame, col: str, bounds: list[float], bin_col: str = "bin"
) -> DataFrame:
    """Assign ``bin_col`` = number of ``bounds`` strictly below the
    value (ties to the LOWER bin) — the map-only half of
    :func:`equal_frequency_bins`, reusable with bounds fitted on a
    DIFFERENT frame (the drift-detection pattern: bin the current
    snapshot with the reference snapshot's bounds)."""
    bin_idx: Column = F.lit(0)
    for b in bounds:
        bin_idx = bin_idx + (F.col(col) > F.lit(float(b))).cast("int")
    return df.withColumn(bin_col, bin_idx)


def fixed_width_bucket(col: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """Fixed-width cell id in ``[0, n_buckets-1]`` for a double column:
    ``floor((x - lo) / (hi - lo) * n)`` clamped into the edge cells.
    Pure IEEE arithmetic (no transcendentals), so a SQL oracle replays
    it bit-for-bit — the shared quantize-the-axis primitive behind
    ``ml.evaluation.roc_auc`` and ``concentration.lorenz_gini``."""
    if hi <= lo:
        raise ValueError(f"fixed_width_bucket needs hi > lo, got {lo}, {hi}")
    raw = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_buckets))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)).cast("long")
