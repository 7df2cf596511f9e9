"""Product quantization ANN (operators/pq.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.pq import (
    pq_codebooks,
    pq_cosine_topk,
    pq_encode,
    pq_query_luts,
)


def _corpus(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_zero_distortion_when_every_vector_is_a_centroid(spark):
    # k = n: Lloyd fixes every sample point as its own centroid, codes
    # reconstruct exactly, so PQ cosine == exact cosine bit-for-bit.
    rng = np.random.RandomState(3)
    vecs = rng.rand(20, 8)
    df = _corpus(spark, vecs)
    books = pq_codebooks(df, "vec_id", "embedding", m=4, k=20)
    enc = {r["vec_id"]: r for r in pq_encode(df, books, "vec_id", "embedding").collect()}
    for i, v in enumerate(vecs):
        recon = np.concatenate(
            [books[j][enc[i]["codes"][j]] for j in range(4)]
        )
        assert np.allclose(recon, v), f"vector {i} not exactly reconstructed"
        assert enc[i]["cnorm2"] == pytest.approx(float(v @ v))


def test_adc_score_equals_numpy_reconstruction_dot(spark):
    rng = np.random.RandomState(7)
    vecs = rng.rand(30, 8)
    df = _corpus(spark, vecs)
    queries = df.filter(F.col("vec_id") < 2)
    out = pq_cosine_topk(df, queries, k=3, m=4, n_centroids=8)
    books = pq_codebooks(df, "vec_id", "embedding", m=4, k=8)
    enc = {r["vec_id"]: r["codes"] for r in pq_encode(df, books, "vec_id", "embedding").collect()}
    for r in out.collect():
        q = vecs[r["query_id"]]
        recon = np.concatenate([books[j][enc[r["neighbor_id"]][j]] for j in range(4)])
        want = float(q @ recon) / (math.sqrt(float(q @ q)) * math.sqrt(float(recon @ recon)))
        assert r["cosine_sim_pq"] == pytest.approx(want, abs=1e-9)


def test_codes_domain_and_determinism(spark):
    rng = np.random.RandomState(11)
    df = _corpus(spark, rng.rand(50, 8))
    books = pq_codebooks(df, "vec_id", "embedding", m=2, k=4)
    enc1 = sorted(map(tuple, pq_encode(df, books, "vec_id", "embedding").collect()))
    enc2 = sorted(map(tuple, pq_encode(df, books, "vec_id", "embedding").collect()))
    assert enc1 == enc2
    for _, codes, cn2 in enc1:
        assert len(codes) == 2 and all(0 <= c < 4 for c in codes)
        assert cn2 >= 0


def test_validation_errors(spark):
    rng = np.random.RandomState(13)
    df = _corpus(spark, rng.rand(10, 8))
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(df, "vec_id", "embedding", m=3, k=4)
    with pytest.raises(ValueError, match="< k"):
        pq_codebooks(df, "vec_id", "embedding", m=2, k=11)


def test_recall_beats_chance_on_fixture(spark, sf_dir):
    from proyecto_final_de_big_data_spark.catalog import load_table
    from proyecto_final_de_big_data_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_cosine_topk(emb, queries, k=5, m=32, n_centroids=64).collect()
    }
    recall = len(ex & ap) / len(ex)
    # measured 0.80-0.82 on the (worst-case, unclustered) fixtures;
    # gate far below measured, the ANN-family contract style
    assert recall >= 0.5, recall


def test_ivf_pq_composition_recall_and_bounds(spark, sf_dir):
    from proyecto_final_de_big_data_spark.catalog import load_table
    from proyecto_final_de_big_data_spark.operators.pq import ivf_pq_cosine_topk
    from proyecto_final_de_big_data_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    rows = ivf_pq_cosine_topk(
        emb, queries, k=5, n_cells=16, n_probe=8, m=32, n_centroids=64
    ).collect()
    ap = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(ex & ap) / len(ex) >= 0.4  # measured 0.68-0.74
    # contract shape: <= k per query, ranks 1..k, no self-pairs
    per_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_refine_exact_topk_matches_brute_force_when_candidates_complete(spark):
    # Hand-checkable identity: when the candidate list contains ALL
    # pairs, the refine stage IS exact brute-force top-k — same pairs,
    # same ranks, same cosines.
    from proyecto_final_de_big_data_spark.operators.pq import refine_exact_topk
    from proyecto_final_de_big_data_spark.operators.similarity import cosine_topk

    rng = np.random.RandomState(11)
    corpus = _corpus(spark, rng.rand(30, 8))
    queries = corpus.filter(F.col("vec_id") < 3)
    all_pairs = queries.select(F.col("vec_id").alias("query_id")).crossJoin(
        corpus.select(F.col("vec_id").alias("neighbor_id"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    refined = refine_exact_topk(all_pairs, corpus, queries, k=4)
    exact = cosine_topk(corpus, queries, k=4)
    got = sorted(map(tuple, refined.collect()))
    want = sorted(map(tuple, exact.collect()))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-12)


def test_refine_scores_are_exact_cosines_not_adc(spark):
    # The refined frame's scores must be TRUE cosines (float read),
    # not the quantized ADC approximations — checked per pair against
    # numpy on a hand-sized fixture.
    from proyecto_final_de_big_data_spark.operators.pq import (
        ivf_pq_refine_cosine_topk,
    )

    rng = np.random.RandomState(5)
    vecs = rng.rand(40, 8)
    corpus = _corpus(spark, vecs)
    queries = corpus.filter(F.col("vec_id") < 2)
    out = ivf_pq_refine_cosine_topk(
        corpus, queries, k=3, n_cells=2, n_probe=2, m=4, n_centroids=8,
        refine=10,
    ).collect()
    assert len(out) == 6
    for r in out:
        q, c = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        true = float(np.dot(q, c) / (np.linalg.norm(q) * np.linalg.norm(c)))
        assert r["cosine_sim"] == pytest.approx(true, abs=1e-9)


def test_refine_recall_dominates_unrefined(spark, sf_dir):
    # The whole point: recall@k after the float re-rank is >= the
    # unrefined IVF,PQ recall@k (candidates are a superset of the
    # unrefined top-k, and exact scoring never demotes a true hit
    # below a quantization artifact).
    from proyecto_final_de_big_data_spark.operators.pq import (
        ivf_pq_cosine_topk,
        ivf_pq_refine_cosine_topk,
    )
    from proyecto_final_de_big_data_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5, batch_cosine=True).collect()
    }
    plain = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_pq_cosine_topk(
            emb, queries, k=5, n_cells=16, n_probe=12, m=32, n_centroids=64
        ).collect()
    }
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_pq_refine_cosine_topk(
            emb, queries, k=5, n_cells=16, n_probe=12, m=32,
            n_centroids=64, refine=50,
        ).collect()
    }
    assert len(exact & refined) >= len(exact & plain)
    assert len(exact & refined) / len(exact) >= 0.85


def test_refine_validates_refine_ge_k(spark):
    from proyecto_final_de_big_data_spark.operators.pq import (
        ivf_pq_refine_cosine_topk,
    )

    corpus = _corpus(spark, np.eye(8))
    with pytest.raises(ValueError, match="refine >= k"):
        ivf_pq_refine_cosine_topk(corpus, corpus, k=5, refine=3)


def test_shared_sample_reproduces_separate_fits_bitwise(spark):
    # The composed IVF,PQ index trains both quantizers from ONE
    # hash-ordered sample collect (r11 optimization); the coarse
    # centroids must equal the separate ivf_centroids collect and the
    # codebooks the separate pq_codebooks collect, bit for bit.
    from proyecto_final_de_big_data_spark.operators.pq import (
        codebooks_from_sample,
    )
    from proyecto_final_de_big_data_spark.operators.similarity_ivf import (
        centroids_from_sample,
        hash_ordered_sample,
        ivf_centroids,
    )

    rng = np.random.RandomState(5)
    df = _corpus(spark, rng.rand(60, 8))
    sample = hash_ordered_sample(df, "vec_id", "embedding", 4096)
    assert centroids_from_sample(sample, 4) == ivf_centroids(
        df, "vec_id", "embedding", 4
    )
    assert codebooks_from_sample(sample, m=2, k=4) == pq_codebooks(
        df, "vec_id", "embedding", m=2, k=4
    )


def test_distributed_fit_matches_serial(spark):
    # The m-task distributed Lloyd fit must reproduce the serial driver
    # loop exactly — same per-subspace arithmetic, different schedule.
    from proyecto_final_de_big_data_spark.operators.pq import (
        _fit_subspace,
        codebooks_from_sample,
    )
    from proyecto_final_de_big_data_spark.operators.similarity_ivf import (
        hash_ordered_sample,
    )

    rng = np.random.RandomState(9)
    df = _corpus(spark, rng.rand(300, 16))
    sample = hash_ordered_sample(df, "vec_id", "embedding", 4096)
    n = len(sample)
    x = np.asarray([list(r["__v"]) for r in sample]).reshape(n, 8, 2)
    serial = [_fit_subspace(x[:, j, :], n, 4, 10, j) for j in range(8)]
    dist = codebooks_from_sample(
        sample, m=8, k=4, sc=spark.sparkContext
    )
    assert dist == serial
