"""IVF (inverted-file) approximate nearest-neighbor: coarse-quantize the
corpus into cells around deterministic centroids, probe the ``n_probe``
closest cells per query, score only those candidates.

Why IVF and not hyperplane LSH for top-k: random-hyperplane buckets only
collide reliably for very high cosine (near-duplicates). For general
top-k the true neighbors sit at moderate cosine (0.3–0.6), where an
8-plane bucket match has ~2% probability per table — measured recall
0.10–0.16 on the embeddings fixture. IVF probes *regions* of the space
instead of exact bit-pattern matches, so recall degrades gracefully
with ``n_probe`` (measured 1.0 at n_probe=4, n_cells=16 on the same
fixture). Hyperplane LSH remains the right tool for the near-dup
regime (cosine >= 0.95, ``similarity_ann.embedding_near_dup_pairs``).

Scale design (100 TB corpus): centroids are a tiny driver-side model
(n_cells << corpus, like a fitted quantizer), the cell assignment is a
single codegen'd projection (n_cells dot products as JVM literals — no
Python), the corpus is hash-partitionable by cell, and each query
touches ~n_probe/n_cells of the corpus. Candidate generation is one
broadcast join on the cell id: no shuffle of the corpus, no O(n²) pair
formation. Choose n_cells ≈ sqrt(corpus_rows) and n_probe for the
recall target.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rollup import argmax_per_group
from .similarity import as_double_array
from .vecmath import cosine_batch, matrix_scores


def hash_ordered_sample(
    corpus: DataFrame, id_col: str, vec_col: str, size: int
) -> list:
    """The ``size`` corpus vectors with the smallest
    ``xxhash64(id::string)`` (id tie-break) — the shared deterministic
    quantizer-training sample. One TakeOrdered pass over the corpus;
    every driver-side fit in this family (coarse centroids, PQ
    codebooks) trains on a prefix of this ordering, so a composed index
    (IVF,PQ) collects the sample ONCE and slices it, instead of paying
    one corpus pass per fit."""
    return (
        corpus.select(
            F.col(id_col).alias("__id"), as_double_array(vec_col).alias("__v")
        )
        .orderBy(F.xxhash64(F.col("__id").cast("string")), F.col("__id"))
        .limit(size)
        .collect()
    )


def centroids_from_sample(rows: list, n_cells: int) -> list[list[float]]:
    """L2-normalized centroids from the first ``n_cells`` rows of a
    :func:`hash_ordered_sample` (driver-side arithmetic only)."""
    cents = []
    for r in rows[:n_cells]:
        v = list(r["__v"])
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / norm for x in v])
    return cents


def ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[list[float]]:
    """Deterministic centroid sample: the ``n_cells`` corpus vectors with
    the smallest xxhash64(id) (a seedless, order-independent pseudo-random
    sample), L2-normalized driver-side.

    This is the quantizer "fit" step — a tiny model (n_cells × dim
    floats) collected to the driver, exactly like fitting KMeans; no data
    path collects anything.
    """
    return centroids_from_sample(
        hash_ordered_sample(corpus, id_col, vec_col, n_cells), n_cells
    )


def _cell_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of dot(vec, centroid_i) — centroids are unit vectors, so the
    argmax over cells equals the cosine argmax (|vec| is constant across
    cells and cancels). One numpy matmul per Arrow batch
    (``vecmath.matrix_scores``); the earlier per-centroid
    ``aggregate(zip_with(...))`` literal expressions ran interpreted,
    per element."""
    return matrix_scores(vec, centroids)


def ivf_assign(
    corpus: DataFrame, centroids: list[list[float]], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, __v, cell): each corpus vector assigned to its closest
    centroid. One vectorized projection, no shuffle. The scores array is
    materialized as a column first so the Python UDF runs once per row,
    not once per consuming expression."""
    scored = corpus.select(
        F.col(id_col),
        as_double_array(vec_col).alias("__v"),
    ).withColumn("__scores", _cell_scores(F.col("__v"), centroids))
    return scored.select(
        F.col(id_col),
        F.col("__v"),
        F.array_position(F.col("__scores"), F.array_max("__scores")).cast("int").alias("cell"),
    )


def ivf_index_increment(
    index: DataFrame,
    batch: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Absorb a new corpus batch into an EXISTING IVF index without
    refitting the coarse quantizer — the :func:`.incremental.
    incremental_dedup` posture applied to the ANN index: ids already
    indexed are skipped by an anti-join on the (id-only) index
    projection, and ONLY the genuinely new rows pay the cell
    assignment, so each increment is O(batch), never O(corpus).

    ``index`` is an assigned frame as produced by :func:`ivf_assign`
    (``(id, __v, cell)``); ``centroids`` is the quantizer fitted when
    the index was built (:func:`ivf_centroids` — keep it with the
    index, it IS the index's model). Returns the extended index frame
    with the same schema, suitable for the probe joins unchanged.

    Assignment parity is exact by construction: a vector's cell
    depends only on the frozen centroid list, so the incremental index
    is row-for-row identical to a full re-assignment of the union —
    the property the ``knn_ann_ivf_increment_contract`` gate pins.
    When drift eventually makes the frozen centroids a bad partition
    (cells skew), refit and re-encode — that's a rebuild, not an
    increment, and the skew is observable from the per-cell census.

    Scale shape (100 TB): the anti-join probes only the id column of
    the index (a partition-prunable parquet read on a real layout);
    the assignment is the usual map-only vectorized projection over
    the batch; the union is a metadata concat. Nothing shuffles the
    existing corpus.

    Extension surface — the reference has no ANN index (`/root/
    reference` computes only descriptive marts); extension per SURVEY
    §8, the maintenance sibling of the IVF/SQ8/PQ family above.
    """
    new_rows = batch.join(
        index.select(F.col(id_col)), id_col, "left_anti"
    )
    return index.unionByName(
        ivf_assign(new_rows, centroids, id_col, vec_col)
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate cosine top-k. Output (query_id, neighbor_id, rank,
    cosine_sim) — same contract as the exact ``cosine_topk``.

    Plan shape: corpus gets one cell-assignment projection; queries
    (small) explode to their ``n_probe`` closest cells and broadcast;
    candidates form by equi-join on ``cell``; exact cosine re-ranks.
    Each corpus vector lives in exactly one cell, so a (query, neighbor)
    pair can only form once — no dedup pass needed.
    """
    centroids = ivf_centroids(corpus, id_col, vec_col, n_cells)

    c_assigned = ivf_assign(corpus, centroids, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )

    q_scored = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("__qv"),
        )
        .withColumn("__scores", _cell_scores(F.col("__qv"), centroids))
        .select(
            "query_id", "__qv", F.posexplode("__scores").alias("__pos", "__score")
        )
    )
    q_cells = argmax_per_group(
        q_scored, ["query_id"], [F.desc("__score"), F.asc("__pos")], n=n_probe
    ).select("query_id", "__qv", (F.col("__pos") + 1).cast("int").alias("cell"))

    cand = (
        c_assigned.join(F.broadcast(q_cells), "cell", "inner")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine_batch(F.col("__qv"), F.col("__v")))
    )
    top = argmax_per_group(cand, ["query_id"], [F.desc("cosine_sim"), F.asc("neighbor_id")], n=k)
    return top.select("query_id", "neighbor_id", "rank", "cosine_sim")


def ivf_sq8_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    levels: int = 255,
) -> DataFrame:
    """IVF probe composed with SQ8 scoring — the FAISS ``IVF,SQ8`` index
    posture (VERDICT r6 item 5): the coarse quantizer routes each query
    to its ``n_probe`` closest cells, and the candidates inside those
    cells are scored from their INTEGER SQ8 codes (1 byte/dim working
    set) via the moment-expanded cosine — the float corpus vectors are
    never read on the scoring path.

    Why this composition matters at 100 TB: ``ivf_cosine_topk`` bounds
    WHICH rows a probe touches (~n_probe/n_cells of the corpus) but
    still streams 4-byte floats per touched dimension;
    ``quantized_cosine_topk`` bounds BYTES per row but touches every
    row. Composed, a probe reads ~n_probe/n_cells of the corpus at 1/4
    the bytes — both axes at once, which is exactly how production ANN
    engines spend their memory-bandwidth budget.

    Plan shape: one projection assigns cells, one projection quantizes
    (both map-only, no shuffle of the corpus); queries (small) probe
    cells AND quantize, then broadcast; candidates form by the cell
    equi-join; the only per-element candidate work is the integer code
    dot. Output (query_id, neighbor_id, rank, cosine_sim_q); accuracy
    is gated by ``knn_ann_ivf_sq_recall`` vs the exact float baseline.
    """
    from .quantize import _approx_dot, _approx_norm2, quantize_embeddings

    centroids = ivf_centroids(corpus, id_col, vec_col, n_cells)

    # Corpus: cell assignment then SQ8 codes; the float vector does not
    # survive past this projection chain.
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    c = quantize_embeddings(
        assigned, "__v", id_col, levels, keep_cols=["cell"]
    ).select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        F.col("q").alias("c_q"),
        F.col("mn").alias("c_mn"),
        F.col("scale").alias("c_scale"),
        F.col("n_dims").alias("c_n_dims"),
        F.col("sum_q").alias("c_sum_q"),
        F.col("sum_q2").alias("c_sum_q2"),
    )

    # Queries: probe cells with the float vector (answer-scale frame),
    # quantize for the scoring side, join the two tiny frames, broadcast.
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
    qq = quantize_embeddings(queries, vec_col, id_col, levels).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("q_q"),
        F.col("mn").alias("q_mn"),
        F.col("scale").alias("q_scale"),
        F.col("n_dims").alias("q_n_dims"),
        F.col("sum_q").alias("q_sum_q"),
        F.col("sum_q2").alias("q_sum_q2"),
    )
    q_full = q_cells.join(qq, "query_id")

    code_dot = F.aggregate(
        F.zip_with("q_q", "c_q", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        c.join(F.broadcast(q_full), "cell", "inner")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim_q",
            _approx_dot("q_", "c_", code_dot)
            / (F.sqrt(_approx_norm2("q_")) * F.sqrt(_approx_norm2("c_"))),
        )
    )
    top = argmax_per_group(
        cand, ["query_id"], [F.desc("cosine_sim_q"), F.asc("neighbor_id")], n=k
    )
    return top.select("query_id", "neighbor_id", "rank", "cosine_sim_q")
