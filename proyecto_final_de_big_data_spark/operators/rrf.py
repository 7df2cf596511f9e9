"""Reciprocal-rank fusion (RRF) — the standard score-free way to merge
rankings from heterogeneous retrievers (Cormack, Clarke & Büttcher,
SIGIR 2009 — public literature): fused(d) = Σ_lists w_l / (k + rank_l(d)),
summing only over lists where ``d`` appears. Because only RANKS enter,
BM25 log-scores and cosine similarities fuse without any score
calibration — which is exactly why hybrid (lexical + semantic) search
stacks standardize on it, and this engine has both legs
(:mod:`.bm25`, :mod:`.similarity`/:mod:`.pq`).

Scale shape (100 TB): inputs are already top-N ranking frames —
answer-scale by construction (N per query, not corpus). One union +
one (keys)-keyed aggregation fuses them; the final ordering windows
partition on the query key, so fused ranking never sorts anything
bigger than Σ_l N rows per query. The corpus appears nowhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    key_cols: list[str],
    group_cols: list[str] | None = None,
    rank_col: str = "rank",
    k: int = 60,
    weights: list[float] | None = None,
    top_n: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """``(*key_cols, rrf_score, n_lists, fused_rank)``. ``key_cols``
    identify an item (e.g. ``[query_id, doc_id]``); ``group_cols``
    (a subset, default none → one global ranking) partition the fused
    ordering. ``weights`` defaults to 1.0 per list. Ranks must be
    1-based positive; NULL-rank rows are rejected loudly (a NULL rank
    means the caller passed a scored-but-unranked frame)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking frame")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError(
            f"weights ({len(weights)}) must match rankings ({len(rankings)})"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = weights or [1.0] * len(rankings)
    group_cols = group_cols or []

    parts = []
    for i, r in enumerate(rankings):
        rk = F.col(rank_col)
        checked = F.when(
            rk.isNull() | (rk < 1),
            F.raise_error(
                F.format_string(
                    "rrf_fuse: list %d has a NULL or non-positive rank "
                    "— pass 1-based ranked frames",
                    F.lit(i),
                )
            ).cast("long"),
        ).otherwise(rk.cast("long"))
        parts.append(
            r.select(
                *key_cols,
                (F.lit(float(w[i])) / (F.lit(float(k)) + checked)).alias(
                    "__contrib"
                ),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(*key_cols).agg(
        F.sum("__contrib").alias("__score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w_rank = Window.partitionBy(*group_cols).orderBy(
        F.desc("__score"), *[F.asc(c) for c in key_cols]
    )
    out = fused.select(
        *key_cols,
        F.round("__score", decimals).alias("rrf_score"),
        "n_lists",
        F.row_number().over(w_rank).alias("fused_rank"),
    )
    if top_n is not None:
        out = out.filter(F.col("fused_rank") <= top_n)
    return out
