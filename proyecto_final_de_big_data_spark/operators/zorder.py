"""Z-order (Morton-curve) layout clustering — multi-dimensional
data skipping for parquet scans.

Sorting a table by one column makes file-level min/max stats razor
sharp for THAT column and useless for every other predicate. Bit-
interleaving the (bucketized) coordinates of several columns into one
Morton key and range-partition-sorting by it gives every participating
column locality: a scan filtered on ANY subset of the z-ordered
columns prunes most files by footer stats alone. This is the layout
optimization behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, built here
from Spark primitives:

1. **Bucketize** each column to an integer in ``[0, 2^bits)``. The
   default is min-max scaling (ONE aggregation pass for the bounds —
   answer-scale driver state); heavily skewed columns compose with
   :func:`operators.binning.equal_frequency_bins` instead (quantile
   buckets equalize cell population — pass the bin column in
   pre-bucketized).
2. **Interleave** the bucket bits (x₀y₀x₁y₁…) with shift/AND/OR
   expressions — a single codegen'd projection, no UDF.
3. **Layout**: ``repartitionByRange(z).sortWithinPartitions(z)`` then
   write — the only shuffle, and it is the point of the operation (a
   range exchange with sampled bounds, the same cost class as any
   sorted-layout rewrite; at 100 TB this runs as the background
   ``optimize`` maintenance pass per partition, not on the hot path).

Effectiveness is verified two ways: the gate hash-checks the Morton
key computation against a DuckDB bit-twiddling oracle, and the unit
tests measure ACTUAL file-stat tightness — per-file min/max width on
both dimensions shrinks vs the single-column-sorted baseline.
"""

from __future__ import annotations

import functools


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_bucketize(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Append ``__zb_<col>`` integer bucket columns in ``[0, 2^bits)``
    via min-max scaling (one aggregation pass for all bounds)."""
    top = (1 << bits) - 1
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    bounds = {c: (float(row[f"__min_{c}"]), float(row[f"__max_{c}"])) for c in cols}
    out = df
    for c in cols:
        lo, hi = bounds[c]
        if hi == lo:
            scaled: Column = F.lit(0)
        else:
            # floor() on BOTH engines — DuckDB's ::INT rounds while
            # Spark's cast truncates, so a bare cast would diverge on
            # the .5 boundary; floor of the identical double product
            # is bit-deterministic in either.
            scaled = F.floor(
                (F.col(c) - F.lit(lo)) * F.lit(float(top)) / F.lit(hi - lo)
            )
        out = out.withColumn(f"__zb_{c}", scaled.cast("long"))
    return out, bounds


def morton_key(bucket_cols: list[str], bits: int = 8) -> Column:
    """Interleave ``bits`` bits of each bucket column into one Morton
    key: bit i of column j lands at position ``i * n_cols + j``.
    Pure shift/AND/OR — one codegen'd expression, no UDF."""
    n = len(bucket_cols)
    terms = []
    for j, c in enumerate(bucket_cols):
        col = F.col(c)
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    # Column | Column is the BOOLEAN or — reduce with bitwiseOR.
    return functools.reduce(
        lambda a, b: a.bitwiseOR(b), terms[1:], terms[0]
    ).alias("zkey")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> DataFrame:
    """Return ``df`` re-laid-out along the Morton curve of ``cols``:
    range-partitioned and sorted by the interleaved key, ready to
    write. The z-key column is kept (``zkey``) so callers can audit
    cell assignment; drop it before writing if undesired."""
    bucketed, _ = minmax_bucketize(df, cols, bits)
    keyed = bucketed.withColumn(
        "zkey", morton_key([f"__zb_{c}" for c in cols], bits)
    ).drop(*[f"__zb_{c}" for c in cols])
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")
