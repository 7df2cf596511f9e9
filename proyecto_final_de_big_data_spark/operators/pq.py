"""Product quantization (PQ) for embedding similarity — the third leg
of the FAISS-style ANN family (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public literature), next to the
IVF cell probe (:mod:`.similarity_ivf`) and SQ8 scalar codes
(:mod:`.quantize`).

Where SQ8 compresses each DIMENSION to a byte (64 bytes for a 64-dim
vector), PQ compresses each SUBVECTOR to a codebook id: with ``m``
subspaces of ``k`` centroids each, a vector is ``m·log2(k)`` bits
(8 subspaces × 16 centroids = 4 bytes — 64× below float32). Scoring
is ADC (asymmetric distance computation): the QUERY stays float and
precomputes, per subspace, its dot product with every centroid — an
``m × k`` lookup table — so scoring a candidate is ``m`` array
lookups + adds, never a float-vector read. The reconstructed norm
``|x̂|² = Σ_j |C_j[code_j]|²`` is exact (subspaces are orthogonal
coordinate blocks) and computed once at encode time.

Codebook fit follows the ``ivf_centroids`` discipline: a deterministic
xxhash64-ordered sample of ``m·k`` corpus vectors, sliced per
subspace — a tiny driver-side model (m·k·d/m floats), no data-path
collect; swap in offline per-subspace KMeans fits where distortion
matters (the operator takes codebooks as a plain nested list).

Scale shape (100 TB): encoding is ONE Arrow map pass (numpy einsum per
batch); the scoring scan reads ``m`` small ints per candidate row with
a per-row cost of m interpreted lookups (m = 8 beats interpreting a
64-element float fold, and the bytes through memory drop 16-64×).
Compose with the IVF cell probe to bound WHICH rows are scanned — the
FAISS ``IVF,PQ`` posture — exactly as ``ivf_sq8_cosine_topk`` composes
the SQ8 codes. Accuracy is contract-by-recall (``knn_ann_pq_recall``)
against the exact float top-k, the same stance as every ANN gate here.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import argmax_per_group
from .similarity import as_double_array


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
) -> list[list[list[float]]]:
    """``codebooks[j][c]`` = centroid ``c`` of subspace ``j`` (each of
    length dim/m), fit by per-subspace Lloyd iterations on a
    DETERMINISTIC xxhash64-ordered sample of ≤ ``sample_size`` corpus
    vectors — the standard FAISS train-on-sample practice, and the
    house bounded-collect discipline (the sample is the quantizer's
    training set, a tiny driver-side model fit; no data-path collect).
    Everything is deterministic: seedless hash ordering, evenly-spaced
    sample rows as initial centroids, ties to the lower centroid id,
    empty clusters keep their previous centroid. Requires
    ``dim % m == 0`` and at least ``k`` sampled rows."""
    from .similarity_ivf import hash_ordered_sample

    return codebooks_from_sample(
        hash_ordered_sample(corpus, id_col, vec_col, sample_size),
        m=m,
        k=k,
        iters=iters,
        sc=corpus.sparkSession.sparkContext,
    )


def _fit_subspace(xj, n: int, k: int, iters: int, j: int):
    """One subspace's Lloyd fit (the exact arithmetic the serial driver
    loop ran — evenly-spaced init, argmin ties to the lower centroid id,
    empty clusters keep their previous centroid)."""
    idx = (np.arange(k) * n // k + j) % n
    cents = xj[idx].copy()
    for _ in range(iters):
        d2 = ((xj[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)  # ties -> lower id (argmin)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = xj[mask].mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def codebooks_from_sample(
    rows: list, m: int, k: int, iters: int = 10, sc=None
) -> list[list[list[float]]]:
    """The :func:`pq_codebooks` Lloyd fit over an already-collected
    :func:`similarity_ivf.hash_ordered_sample` — lets a composed index
    (IVF,PQ) train the coarse centroids and the codebooks from ONE
    corpus sample pass (the centroid sample is a prefix of the same
    hash ordering), instead of one TakeOrdered corpus pass per fit.

    The ``m`` subspace fits are independent; with a SparkContext they
    run as one ``m``-task job (sample broadcast, one subspace per task)
    instead of a serial single-threaded driver loop — per-subspace
    arithmetic is byte-for-byte the serial loop's, only the schedule
    changes (pinned by ``test_distributed_fit_matches_serial``). Tiny
    fits (small ``m``/sample) stay driver-side: a job would cost more
    than it saves."""
    n = len(rows)
    if n < k:
        raise ValueError(f"pq_codebooks: sample has {n} rows < k = {k}")
    dim = len(rows[0]["__v"])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    x = np.asarray([list(r["__v"]) for r in rows], dtype=np.float64).reshape(
        n, m, dsub
    )
    if sc is not None and m >= 8 and n >= 256:
        xb = sc.broadcast(x)
        try:
            fitted = (
                sc.parallelize(range(m), m)
                .map(lambda j: (j, _fit_subspace(xb.value[:, j, :], n, k, iters, j)))
                .collect()
            )
        finally:
            xb.destroy()
        return [b for _, b in sorted(fitted)]
    return [_fit_subspace(x[:, j, :], n, k, iters, j) for j in range(m)]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    keep_cols: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """``(id, [keep_cols...,] codes array<int>[m], cnorm2 double)``:
    per subspace the nearest-centroid id (L2), plus the exact
    reconstructed squared norm. One Arrow batch pass — reshape,
    einsum, argmin — no shuffle. ``keep_cols`` is ``[(name, ddl_type)]``
    pairs carried through untouched (e.g. the IVF cell id)."""
    books = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, k, dsub = books.shape
    cn2 = np.einsum("mkd,mkd->mk", books, books)  # (m, k) centroid norms²
    keep = keep_cols or []

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf["__v"].tolist(), dtype=np.float64).reshape(
                len(pdf), m, dsub
            )
            # ||x_j - c||² = |x_j|² - 2·x_j·c + |c|²; |x_j|² is constant
            # over c, so argmin needs only the cross and centroid terms.
            cross = np.einsum("nmd,mkd->nmk", x, books)
            codes = np.argmin(cn2[None, :, :] - 2.0 * cross, axis=2)
            cnorm2 = cn2[np.arange(m)[None, :], codes].sum(axis=1)
            out = {id_col: pdf[id_col].values}
            for name, _t in keep:
                out[name] = pdf[name].values
            out["codes"] = [c.astype("int32").tolist() for c in codes]
            out["cnorm2"] = cnorm2
            yield pd.DataFrame(out)

    staged = corpus.select(
        F.col(id_col),
        *[F.col(name) for name, _t in keep],
        as_double_array(vec_col).alias("__v"),
    )
    # id dtype follows the input (string doc ids are legal), never a
    # hardcoded long
    id_type = dict(corpus.dtypes)[id_col]
    kept_ddl = "".join(f", {name} {t}" for name, t in keep)
    return staged.mapInPandas(
        do,
        schema=f"{id_col} {id_type}{kept_ddl}, codes array<int>, cnorm2 double",
    )


def pq_query_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """``(query_id, lut array<double>[m·k], qnorm double)``: the ADC
    lookup table, flattened so ``lut[j·k + c] = dot(q_j, C_j[c])``.
    Answer-scale (queries are few); one Arrow pass."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = books.shape

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.asarray(pdf["__v"].tolist(), dtype=np.float64).reshape(
                len(pdf), m, dsub
            )
            lut = np.einsum("nmd,mkd->nmk", q, books).reshape(len(pdf), m * k)
            yield pd.DataFrame(
                {
                    "query_id": pdf[id_col].values,
                    "lut": [r.tolist() for r in lut],
                    "qnorm": np.sqrt(np.einsum("nmd,nmd->n", q, q)),
                }
            )

    staged = queries.select(F.col(id_col), as_double_array(vec_col).alias("__v"))
    id_type = dict(queries.dtypes)[id_col]
    return staged.mapInPandas(
        do, schema=f"query_id {id_type}, lut array<double>, qnorm double"
    )


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_centroids: int = 16,
) -> DataFrame:
    """PQ-ADC approximate cosine top-k: ``(query_id, neighbor_id, rank,
    cosine_sim_pq)`` — the brute-force-scan-but-tiny-bytes posture
    (compose with the IVF probe to also bound rows). The only
    per-candidate work is ``m`` lookups into the broadcast query LUT;
    float corpus vectors are never read on the scoring path."""
    books = pq_codebooks(corpus, id_col, vec_col, m=m, k=n_centroids)
    enc = pq_encode(corpus, books, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    luts = pq_query_luts(queries, books, id_col, vec_col)
    kk = n_centroids
    dot = F.aggregate(
        F.zip_with(
            "codes",
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at("lut", (j * kk + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        enc.join(F.broadcast(luts), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim_pq",
            F.when(
                (F.col("cnorm2") > 0) & (F.col("qnorm") > 0),
                dot / (F.col("qnorm") * F.sqrt("cnorm2")),
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim_pq")
    )
    top = argmax_per_group(
        cand,
        ["query_id"],
        [F.desc_nulls_last("cosine_sim_pq"), F.asc("neighbor_id")],
        n=k,
    )
    return top.select("query_id", "neighbor_id", "rank", "cosine_sim_pq")


def refine_exact_topk(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact-float re-rank of an ANN candidate list — the FAISS
    ``RefineFlat`` posture: ``candidates`` is any ``(query_id,
    neighbor_id, ...)`` frame (typically an ANN top-R with R ≫ k);
    each candidate's TRUE cosine is recomputed from the float vectors
    and the exact top-``k`` per query is returned as ``(query_id,
    neighbor_id, rank, cosine_sim)``.

    Scale shape: the candidate frame is answer-scale (queries × R), so
    it BROADCASTS onto the corpus scan — the corpus's float vectors
    are read map-only for candidate rows and never shuffled; query
    vectors join broadcast too. Exactly two broadcast hash joins + the
    per-query k-bounded top-k; quantization error vanishes for every
    true neighbor the candidate stage surfaced, so end-to-end recall
    equals the candidate stage's recall@R — the standard fix for
    composed-index recall at bounded extra cost (R float reads per
    query instead of 0, still never a corpus scan)."""
    cand = candidates.select("query_id", "neighbor_id")
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__cv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("__qv"),
    )
    from .similarity import cosine

    scored = (
        cv.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine_sim", cosine(F.col("__qv"), F.col("__cv")))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    top = argmax_per_group(
        scored,
        ["query_id"],
        [F.desc_nulls_last("cosine_sim"), F.asc("neighbor_id")],
        n=k,
    )
    return top.select("query_id", "neighbor_id", "rank", "cosine_sim")


def ivf_pq_refine_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 32,
    n_centroids: int = 64,
    refine: int = 50,
) -> DataFrame:
    """Two-stage ANN: IVF,PQ candidate generation (ADC scores pick the
    top-``refine`` per query) followed by :func:`refine_exact_topk` —
    the FAISS ``IVF,PQ + RefineFlat`` composition. The PQ stage's job
    shifts from ranking to RECALL (surface the true neighbors
    somewhere in the top-R); the float re-rank then restores exact
    order, lifting end-to-end recall@k to recall@R of the candidate
    stage at the cost of R float-vector reads per query."""
    if refine < k:
        raise ValueError(
            f"ivf_pq_refine_cosine_topk needs refine >= k; got {refine} < {k}"
        )
    cands = ivf_pq_cosine_topk(
        corpus,
        queries,
        id_col,
        vec_col,
        k=refine,
        n_cells=n_cells,
        n_probe=n_probe,
        m=m,
        n_centroids=n_centroids,
    )
    return refine_exact_topk(cands, corpus, queries, id_col, vec_col, k=k)


def ivf_pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 32,
    n_centroids: int = 64,
) -> DataFrame:
    """IVF cell probe composed with PQ-ADC scoring — the FAISS
    ``IVF,PQ`` index posture, completing the composition matrix next
    to ``similarity_ivf.ivf_sq8_cosine_topk``: the coarse quantizer
    bounds WHICH rows a query touches (~n_probe/n_cells of the
    corpus), PQ codes bound BYTES per touched row (m·log2(k) bits vs
    4 bytes/dim float). Codes are fit on RAW vectors (IVF,Flat + PQ),
    not residuals — the residual refinement is a documented upgrade,
    orthogonal to the plan shape.

    Plan: one Arrow projection assigns cells, one encodes PQ (cell id
    rides through the encode pass — the corpus is scanned ONCE and
    never shuffled); queries probe cells float-side and carry their
    ADC LUT; the tiny (query × probe) frame broadcasts onto the cell
    equi-join; candidates cost m lookups each. Output
    ``(query_id, neighbor_id, rank, cosine_sim_pq)``; accuracy is
    contract-by-recall (``knn_ann_ivf_pq_recall``).
    """
    from .similarity_ivf import (
        _cell_scores,
        centroids_from_sample,
        hash_ordered_sample,
    )

    # ONE quantizer-training pass: the coarse-centroid sample is the
    # n_cells-prefix of the codebook sample's hash ordering, so a single
    # TakeOrdered collect trains both fits (bit-identical to the
    # separate ivf_centroids + pq_codebooks collects it replaces).
    sample = hash_ordered_sample(corpus, id_col, vec_col, max(4096, n_cells))
    centroids = centroids_from_sample(sample, n_cells)
    books = codebooks_from_sample(
        sample, m=m, k=n_centroids, sc=corpus.sparkSession.sparkContext
    )

    from .similarity_ivf import ivf_assign

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    enc = pq_encode(
        assigned.select(F.col(id_col), "cell", F.col("__v")),
        books,
        id_col,
        "__v",
        keep_cols=[("cell", "int")],
    ).withColumnRenamed(id_col, "neighbor_id")

    q_scored = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("__qv"),
        )
        .withColumn("__scores", _cell_scores(F.col("__qv"), centroids))
        .select("query_id", F.posexplode("__scores").alias("__pos", "__score"))
    )
    q_cells = argmax_per_group(
        q_scored, ["query_id"], [F.desc("__score"), F.asc("__pos")], n=n_probe
    ).select("query_id", (F.col("__pos") + 1).cast("int").alias("cell"))
    luts = pq_query_luts(queries, books, id_col, vec_col)
    q_side = q_cells.join(luts, "query_id")

    kk = n_centroids
    dot = F.aggregate(
        F.zip_with(
            "codes",
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at("lut", (j * kk + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        enc.join(F.broadcast(q_side), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim_pq",
            F.when(
                (F.col("cnorm2") > 0) & (F.col("qnorm") > 0),
                dot / (F.col("qnorm") * F.sqrt("cnorm2")),
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim_pq")
    )
    top = argmax_per_group(
        cand,
        ["query_id"],
        [F.desc_nulls_last("cosine_sim_pq"), F.asc("neighbor_id")],
        n=k,
    )
    return top.select("query_id", "neighbor_id", "rank", "cosine_sim_pq")
