"""JL random projection (operators/projection.py).

The hand fixture pins the projection against a NumPy twin built from
the independent hashlib sign computation (the different-implementation
discipline: the operator's Catalyst fold vs a straight matrix
multiply), plus an exactly-hand-checkable k=1 case.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from proyecto_final_de_big_data_spark.operators.projection import (
    jl_distance_audit,
    jl_project,
    jl_sign,
    jl_sign_matrix,
)


def test_sign_matches_hashlib_twin():
    for j in range(4):
        for i in range(8):
            h = hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()
            want = 1.0 if int(h[:15], 16) % 2 == 0 else -1.0
            assert jl_sign(j, i) == want


def test_k1_projection_hand_checkable(spark):
    # k=1: proj = Σ sign(0,i)·v_i / 1 — hand-multiply with the signs.
    signs = jl_sign_matrix(1, 4)[0]
    v = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(1, v)], "id long, vec array<double>")
    got = jl_project(df, "vec", dim=4, k=1).collect()[0]["proj"]
    assert got[0] == sum(s * x for s, x in zip(signs, v))


def test_projection_matches_numpy_twin(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(10, 16).astype("float64")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(10)],
        "id long, vec array<double>",
    )
    k = 4
    got = {r["id"]: r["proj"] for r in jl_project(df, "vec", 16, k).collect()}
    mat = np.array(jl_sign_matrix(k, 16))
    want = vecs @ mat.T / math.sqrt(k)
    for i in range(10):
        assert got[i] == pytest.approx(list(want[i]), abs=1e-9)


def test_distance_audit_jl_property(spark):
    # 30 unit-ish vectors, dim 64 -> k=16: ratios concentrate near 1.
    rng = np.random.RandomState(11)
    vecs = rng.randn(30, 64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "id long, vec array<double>",
    )
    rows = jl_distance_audit(df, "id", "vec", dim=64, k=16, max_ids=30).collect()
    assert len(rows) == 30 * 29 // 2
    ratios = [r["ratio"] for r in rows]
    assert all(0.2 < x < 2.5 for x in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15
    # d2_orig is the true squared distance (spot-check one pair).
    by_pair = {(r["id_a"], r["id_b"]): r for r in rows}
    d2 = float(((vecs[0] - vecs[1]) ** 2).sum())
    assert by_pair[(0, 1)]["d2_orig"] == pytest.approx(d2, abs=1e-5)


def test_identical_vectors_null_ratio_and_validation(spark):
    v = [1.0, 2.0]
    df = spark.createDataFrame(
        [(0, v), (1, v)], "id long, vec array<double>"
    )
    row = jl_distance_audit(df, "id", "vec", dim=2, k=1, max_ids=2).collect()[0]
    assert row["d2_orig"] == 0.0 and row["ratio"] is None
    with pytest.raises(ValueError, match="max_ids"):
        jl_distance_audit(df, "id", "vec", 2, 1, max_ids=1)
    with pytest.raises(ValueError, match="k >= 1"):
        jl_sign_matrix(0, 2)


def test_plan_literal_bound_guard(spark):
    # The k×dim sign matrix is embedded in the plan as literals; an
    # unguarded dim=4096 × k=256 call would compile a million-literal
    # plan. The bound must raise BEFORE the matrix is built, and be
    # deliberately overridable.
    with pytest.raises(ValueError, match="max_literals"):
        jl_sign_matrix(256, 4096)
    df = spark.createDataFrame([(0, [1.0, 2.0])], "id long, vec array<double>")
    with pytest.raises(ValueError, match="max_literals"):
        jl_project(df, "vec", dim=2, k=2, max_literals=3)
    # Raising the bound explicitly works (2*2 <= 4).
    assert jl_project(df, "vec", dim=2, k=2, max_literals=4).count() == 1


def test_dimension_mismatch_raises_not_nulls(spark):
    # zip_with pads with NULLs; a ragged vector must hard-fail, not
    # project to all-NULL (review finding).
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "id long, vec array<double>"
    )
    out = jl_project(df, "vec", dim=4, k=2)
    with pytest.raises(Exception, match="jl_project: vector length"):
        out.collect()


def test_distance_audit_forwards_max_literals(spark):
    # The audit must expose the deliberate override path for large
    # k*dim (review finding: the guard would otherwise hard-break the
    # bounded audit with no escape hatch).
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 1.0])], "id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="max_literals"):
        jl_distance_audit(df, "id", "vec", dim=2, k=2, max_literals=3)
    assert (
        jl_distance_audit(df, "id", "vec", dim=2, k=2, max_literals=4).count()
        == 1
    )
