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
