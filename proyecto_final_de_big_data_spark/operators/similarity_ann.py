"""Approximate nearest-neighbor scale path: random-hyperplane (SimHash)
LSH bucketing for cosine similarity.

Hyperplanes are derived deterministically from xxhash64 of (dim, plane)
— a cheap pseudo-random ±1 projection matrix materialized as literals —
so the whole pipeline stays JVM-side, reproducible, and shuffle-bounded:
candidates only form within a bucket (one groupBy-join on the bucket
key) instead of the O(n²) cross join.

Recall improves with multiple hash tables (``n_tables``); each table is
an independent set of ``n_planes`` hyperplanes.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import as_double_array, cosine


def _pseudo_random_sign(dim: int, plane: int, table: int) -> float:
    """Deterministic ±1 from a splitmix-style integer hash (pure python,
    evaluated once at plan build — becomes a literal in the plan)."""
    x = (dim * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9 + table * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    x = (x * 0xD6E8FEB86659FD93) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    return 1.0 if x & 1 else -1.0


def simhash_bucket(vec: Column, dim: int, n_planes: int = 12, table: int = 0) -> Column:
    """Bit-packed sign pattern of ``n_planes`` random projections."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(_pseudo_random_sign(d, p, table)) for d in range(dim)]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed self-join,
    cosine-verified at ``threshold``. Output (id_a, id_b, cosine_sim).

    The bucket self-join bounds candidates to same-bucket pairs —
    near-identical vectors collide with high probability in at least
    one of ``n_tables`` tables.
    """
    c = corpus.select(F.col(id_col), as_double_array(vec_col).alias("__v"))
    banded = c.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("table"), simhash_bucket(F.col("__v"), dim, n_planes, t).alias("bucket"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select(id_col, "__v", "tb.table", "tb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__v").alias("__va"),
            F.col("b.__v").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine_sim", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
    return pairs


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 4,
) -> DataFrame:
    """LSH-bucketed approximate top-k: only score pairs sharing a bucket
    in at least one table. Output (query_id, neighbor_id, rank, cosine_sim).
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("__qv"))

    c_b = c.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("table"), simhash_bucket(F.col("__cv"), dim, n_planes, t).alias("bucket"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select("neighbor_id", "__cv", "tb.table", "tb.bucket")
    q_b = q.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("table"), simhash_bucket(F.col("__qv"), dim, n_planes, t).alias("bucket"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select("query_id", "__qv", "tb.table", "tb.bucket")

    cand = (
        c_b.join(F.broadcast(q_b), ["table", "bucket"], "inner")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine_sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    from .rollup import argmax_per_group

    top = argmax_per_group(cand, ["query_id"], [F.desc("cosine_sim"), F.asc("neighbor_id")], n=k)
    return top.select("query_id", "neighbor_id", "rank", "cosine_sim")
