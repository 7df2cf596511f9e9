"""Arrow-vectorized dense vector math (Pandas UDFs over numpy).

Why this exists: Spark's higher-order functions (``aggregate`` /
``zip_with`` / ``transform``) are evaluated on the interpreted
expression path — per element, with boxing — so a 64-dim dot product
against 40 hyperplanes costs ~2,500 interpreted ops *per row*. Profiled
on the embeddings fixture that made tiny (2k-row) inputs take seconds.
Dense linear algebra is the documented case for dropping to a Pandas
UDF: Arrow ships each batch as contiguous float buffers, numpy runs one
BLAS-backed matmul per batch, and the result streams back columnar.

Scale notes (100 TB corpus): the literal matrices here (hyperplanes,
IVF centroids) are tiny driver-side models captured in the UDF closure
— broadcast once per executor by task serialization, never shuffled.
Per-batch work is O(batch × dim × m) sequential-memory FLOPs; no
per-row Python is ever invoked (one Python call per ~10k-row Arrow
batch). The sequential-fold JVM variants in ``similarity.py`` remain
for the oracle-exact paths where accumulation ORDER must match DuckDB's
``list_dot_product`` (unrounded averages); everything rounded or
approximate uses these.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _stack(s: pd.Series) -> np.ndarray:
    """(batch, dim) float64 matrix from a Series of array values."""
    return np.asarray(s.tolist(), dtype=np.float64)


def matrix_scores(vec: Column, matrix: list[list[float]]) -> Column:
    """array<double> of dot(vec, matrix[i]) for each row of ``matrix``.

    One BLAS matmul per Arrow batch: (batch × dim) @ (dim × m).
    """
    m = np.asarray(matrix, dtype=np.float64).T  # (dim, m)

    @pandas_udf("array<double>")
    def scores(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        out = _stack(v) @ m
        return pd.Series(list(out))

    return scores(vec)


def hyperplane_buckets(
    vec: Column, dim: int, n_planes: int, n_tables: int, sign_fn
) -> Column:
    """array<long>[n_tables]: bit-packed sign pattern of ``n_planes``
    random projections per table (``sign_fn(dim, plane, table)`` → ±1,
    evaluated once at plan build into the closure matrix).

    Semantics match the expression formulation in ``similarity_ann``:
    bit p of table t is set iff dot(vec, plane_{t,p}) > 0 (strict).
    """
    planes = np.asarray(
        [[sign_fn(d, p, t) for t in range(n_tables) for p in range(n_planes)] for d in range(dim)],
        dtype=np.float64,
    )  # (dim, n_tables*n_planes)
    weights = np.asarray([1 << p for p in range(n_planes)], dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        proj = _stack(v) @ planes  # (batch, n_tables*n_planes)
        bits = (proj > 0).reshape(len(proj), n_tables, n_planes)
        packed = bits @ weights  # (batch, n_tables) int64
        return pd.Series(list(packed))

    return buckets(vec)


def cosine_batch(a: Column, b: Column) -> Column:
    """Vectorized cosine similarity of two array columns (double).

    Differs from the JVM fold in ``similarity.cosine`` only by float
    summation order (numpy pairwise vs sequential) — last-ulp; use only
    where the consumer rounds or thresholds away ulp noise.
    """

    @pandas_udf("double")
    def cos(pa: pd.Series, pb: pd.Series) -> pd.Series:
        if len(pa) == 0:
            return pd.Series([], dtype=np.float64)
        ma, mb = _stack(pa), _stack(pb)
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.sqrt(np.einsum("ij,ij->i", ma, ma) * np.einsum("ij,ij->i", mb, mb))
        return pd.Series(num / den)

    return cos(a, b)
