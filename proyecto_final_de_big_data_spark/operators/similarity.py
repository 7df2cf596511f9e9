"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query
  set against the corpus, dot products via built-in ``zip_with`` +
  ``aggregate`` (JVM-side fold, no Python), ``row_number`` per query.
  At 100 TB corpus this is one broadcast-join scan, embarrassingly
  parallel, no shuffle until the (tiny) per-query top-k.
- Math is done in DOUBLE (cast from float) so results are stable and
  oracle-comparable.

The approximate scale path (LSH-bucketed / IVF) lives in
``similarity_ann.py`` — random-hyperplane SimHash bucketing composed
from the same built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    batch_cosine: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Output: (query_id, neighbor_id, rank, cosine_sim). Self-matches
    excluded. Ties broken by neighbor id for determinism.

    ``batch_cosine`` switches scoring to the Arrow/numpy batch variant
    (``vecmath.cosine_batch``) — ~an order of magnitude faster, but its
    pairwise summation differs from DuckDB's sequential
    ``list_dot_product`` in the last ulp. Keep it off when the emitted
    cosine values are hash-compared against a SQL oracle; on when only
    the neighbor SET is consumed (recall baselines).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("__cv")
    )
    if batch_cosine:
        from .vecmath import cosine_batch as _cos
    else:
        _cos = cosine
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", _cos(F.col("__qv"), F.col("__cv")))
    )
    from .rollup import argmax_per_group

    top = argmax_per_group(
        scored, ["query_id"], [F.desc("cosine_sim"), F.asc("neighbor_id")], n=k
    )
    return top.select("query_id", "neighbor_id", "rank", "cosine_sim")
