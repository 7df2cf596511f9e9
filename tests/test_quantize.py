"""Scalar quantization for embeddings (operators/quantize.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.quantize import (
    quantize_embeddings,
    quantized_cosine_topk,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_bounded_and_moments_exact(spark):
    df = _emb(spark, [(1, [0.0, 0.5, 1.0, 0.25])])
    out = quantize_embeddings(df).collect()[0]
    assert out["mn"] == 0.0
    assert math.isclose(out["scale"], 1.0 / 255)
    assert out["q"] == [0, 128, 255, 64]  # round((x-mn)/scale)
    assert out["n_dims"] == 4
    assert out["sum_q"] == sum(out["q"])
    assert out["sum_q2"] == sum(v * v for v in out["q"])


def test_constant_vector_reconstructs_exactly(spark):
    df = _emb(spark, [(1, [3.0, 3.0, 3.0])])
    out = quantize_embeddings(df).collect()[0]
    assert out["scale"] == 0.0 and out["q"] == [0, 0, 0] and out["mn"] == 3.0


def test_reconstruction_error_within_half_step(spark):
    vec = [0.13, -2.7, 5.1, 0.0, 3.33]
    df = _emb(spark, [(1, vec)])
    out = quantize_embeddings(df).collect()[0]
    for orig, code in zip(vec, out["q"]):
        rebuilt = out["mn"] + code * out["scale"]
        assert abs(rebuilt - orig) <= out["scale"] / 2 + 1e-12


def test_quantized_topk_matches_exact_on_separated_vectors(spark):
    # Three well-separated directions: quantization cannot reorder them.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = _emb(spark, rows)
    queries = df.filter(F.col("vec_id") == 0)
    top = quantized_cosine_topk(df, queries, k=1).collect()
    assert len(top) == 1
    assert (top[0]["query_id"], top[0]["neighbor_id"]) == (0, 1)


def test_no_python_udf_in_plan(spark):
    df = _emb(spark, [(1, [0.0, 1.0])])
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_sq8_composed_topk(spark):
    # Composed cell-probe + integer-code scoring (similarity_ivf.
    # ivf_sq8_cosine_topk): on well-separated directions with every cell
    # probed, the composed path must agree with the exact ranking, and
    # the candidate scoring plan must not carry the float vector.
    from proyecto_final_de_big_data_spark.operators.similarity_ivf import (
        ivf_sq8_cosine_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = _emb(spark, rows)
    queries = df.filter(F.col("vec_id") == 0)
    out = ivf_sq8_cosine_topk(df, queries, k=1, n_cells=2, n_probe=2)
    top = out.collect()
    assert len(top) == 1
    assert (top[0]["query_id"], top[0]["neighbor_id"]) == (0, 1)
    # scoring side reads codes + moments: the integer code arrays (c_q)
    # feed the candidate join, and the cosine column is the quantized
    # one — the float corpus vector never reaches the scoring output.
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "c_q" in plan and "cosine_sim_q" in plan
