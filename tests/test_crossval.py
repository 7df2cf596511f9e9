"""K-fold linear CV in two passes (operators/crossval.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.crossval import kfold_linear_cv


def _fit_ref(rows):
    X = np.array([[1.0, r[1], r[2]] for r in rows])
    yv = np.array([r[3] for r in rows])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    return beta


def test_matches_numpy_per_fold(spark):
    rng = np.random.RandomState(7)
    rows = [
        (int(i), float(x1), float(x2), float(3.0 + 2.0 * x1 - 1.5 * x2 + e))
        for i, (x1, x2, e) in enumerate(
            zip(rng.rand(80) * 10, rng.rand(80) * 5, rng.randn(80))
        )
    ]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    out = {
        r["fold"]: r
        for r in (
            row.asDict()
            for row in kfold_linear_cv(
                df, "x1", "x2", "y", F.col("id") % 4, k=4
            ).collect()
        )
    }
    assert set(out) == {0, 1, 2, 3}
    for f in range(4):
        train = [r for r in rows if r[0] % 4 != f]
        test = [r for r in rows if r[0] % 4 == f]
        beta = _fit_ref(train)
        assert out[f]["n_train"] == len(train)
        assert out[f]["n_test"] == len(test)
        assert out[f]["intercept"] == pytest.approx(beta[0], abs=1e-4)
        assert out[f]["b1"] == pytest.approx(beta[1], abs=1e-4)
        assert out[f]["b2"] == pytest.approx(beta[2], abs=1e-4)
        preds = [beta[0] + beta[1] * r[1] + beta[2] * r[2] for r in test]
        resid = [r[3] - p for r, p in zip(test, preds)]
        rmse = float(np.sqrt(np.mean(np.square(resid))))
        mae = float(np.mean(np.abs(resid)))
        assert out[f]["rmse"] == pytest.approx(rmse, abs=1e-4)
        assert out[f]["mae"] == pytest.approx(mae, abs=1e-4)


def test_near_perfect_fit_has_tiny_error(spark):
    rows = [
        (i, float(i % 11), float(i % 7), 1.0 + 2.0 * (i % 11) + 3.0 * (i % 7))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    out = kfold_linear_cv(df, "x1", "x2", "y", F.col("id") % 3, k=3).collect()
    for r in out:
        assert r["rmse"] == pytest.approx(0.0, abs=1e-5)
        assert r["b1"] == pytest.approx(2.0, abs=1e-5)
        assert r["b2"] == pytest.approx(3.0, abs=1e-5)


def test_singular_system_yields_null(spark):
    # x1 constant on every training side -> singular normal equations.
    rows = [(i, 1.0, 1.0, float(i)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    out = kfold_linear_cv(df, "x1", "x2", "y", F.col("id") % 3, k=3).collect()
    for r in out:
        assert r["intercept"] is None and r["b1"] is None and r["b2"] is None
        assert r["rmse"] is None and r["mae"] is None


def test_validates_k(spark):
    df = spark.createDataFrame([(1, 1.0, 1.0, 1.0)], "id long, x1 double, x2 double, y double")
    with pytest.raises(ValueError):
        kfold_linear_cv(df, "x1", "x2", "y", F.col("id") % 2, k=1)


def test_incomplete_rows_excluded_from_system(spark):
    from pyspark.sql import functions as F

    from proyecto_final_de_big_data_spark.operators.crossval import (
        kfold_linear_cv,
    )

    rows = [(i, float(i % 5), float(i % 3), float(2 * (i % 5) + 3 * (i % 3) + 1))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    dirty = df.unionByName(
        spark.createDataFrame(
            [(100, None, 1.0, 1.0), (101, 2.0, None, 1.0)],
            "id long, x1 double, x2 double, y double",
        )
    )
    clean_out = sorted(
        kfold_linear_cv(df, "x1", "x2", "y", F.col("id") % 2, k=2).collect()
    )
    dirty_out = sorted(
        kfold_linear_cv(dirty, "x1", "x2", "y", F.col("id") % 2, k=2).collect()
    )
    assert clean_out == dirty_out  # NULL rows contribute nothing


def test_fold_expression_reconciled_with_k(spark):
    # ADVICE r7: a fold expression yielding fewer distinct folds than k
    # (or values outside 0..k-1) must fail loudly, not run a different CV.
    df = spark.createDataFrame(
        [(i, float(i), float(2 * i), float(3 * i)) for i in range(20)],
        "id long, x1 double, x2 double, y double",
    )
    with pytest.raises(Exception, match="distinct fold"):
        kfold_linear_cv(
            df, "x1", "x2", "y", F.pmod("id", F.lit(2)), k=4
        ).collect()
    with pytest.raises(Exception, match="distinct fold"):
        # right count, wrong domain (1..4 instead of 0..3)
        kfold_linear_cv(
            df, "x1", "x2", "y", F.pmod("id", F.lit(4)) + 1, k=4
        ).collect()
    # the happy path still runs
    assert kfold_linear_cv(
        df, "x1", "x2", "y", F.pmod("id", F.lit(4)), k=4
    ).count() == 4


# ---- learning curve (operators/crossval.py:learning_curve_linear) ----


def test_learning_curve_perfect_fit_hand_checked(spark):
    # Hand fixture: y = 2 + 3*x1 + 0.5*x2 EXACTLY on every row; every
    # nested training subset solves the same (unique) system, so all
    # curve points recover (2, 3, 0.5) with rmse = mae = 0.
    from proyecto_final_de_big_data_spark.operators.crossval import (
        learning_curve_linear,
    )

    # x2 uses a modulus COPRIME to the slice modulus 5 (gcd(10,9)=1) so
    # no slice sees a constant column (which would be singular).
    rows = [
        (
            i,
            float(i % 7),
            float((i * 2 + 1) % 9),
            2.0 + 3.0 * (i % 7) + 0.5 * ((i * 2 + 1) % 9),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["k", "x1", "x2", "y"])
    out = learning_curve_linear(
        df, "x1", "x2", "y", F.pmod(F.col("k"), F.lit(5)), n_slices=4
    ).collect()
    assert len(out) == 4
    fr = sorted(r["fraction"] for r in out)
    assert fr == [0.25, 0.5, 0.75, 1.0]
    for r in out:
        assert r["intercept"] == pytest.approx(2.0, abs=1e-6)
        assert r["b1"] == pytest.approx(3.0, abs=1e-6)
        assert r["b2"] == pytest.approx(0.5, abs=1e-6)
        assert r["rmse"] == 0.0 and r["mae"] == 0.0
    # nested design: n_train strictly increases with the fraction
    ns = [r["n_train"] for r in sorted(out, key=lambda r: r["fraction"])]
    assert ns == sorted(ns) and len(set(ns)) == 4
    # every point scores the SAME fixed test set
    assert len({r["n_test"] for r in out}) == 1


def test_learning_curve_matches_manual_refit(spark):
    # Noisy label: each curve point must equal an independently-fit
    # closed-form OLS on exactly slices 0..j (numpy lstsq twin).
    import numpy as np
    from proyecto_final_de_big_data_spark.operators.crossval import (
        learning_curve_linear,
    )

    rng = np.random.RandomState(9)
    ks = np.arange(300)
    x1 = rng.rand(300) * 10
    x2 = rng.rand(300) * 4
    yv = 1.5 + 0.8 * x1 - 2.0 * x2 + rng.randn(300) * 0.3
    df = spark.createDataFrame(
        [(int(k), float(a), float(b), float(c)) for k, a, b, c in zip(ks, x1, x2, yv)],
        ["k", "x1", "x2", "y"],
    )
    out = {
        r["fraction"]: r
        for r in learning_curve_linear(
            df, "x1", "x2", "y", F.pmod(F.col("k"), F.lit(4)), n_slices=3,
            decimals=6,
        ).collect()
    }
    test_mask = ks % 4 == 3
    for j in range(3):
        train_mask = (ks % 4) <= j
        train_mask &= ~test_mask
        A = np.c_[np.ones(train_mask.sum()), x1[train_mask], x2[train_mask]]
        coef, *_ = np.linalg.lstsq(A, yv[train_mask], rcond=None)
        frac = round((j + 1) / 3, 6)
        r = out[frac]
        assert r["intercept"] == pytest.approx(coef[0], abs=1e-4)
        assert r["b1"] == pytest.approx(coef[1], abs=1e-4)
        assert r["b2"] == pytest.approx(coef[2], abs=1e-4)
        pred = coef[0] + coef[1] * x1[test_mask] + coef[2] * x2[test_mask]
        resid = yv[test_mask] - pred
        assert r["rmse"] == pytest.approx(float(np.sqrt((resid ** 2).mean())), abs=1e-4)
        assert r["mae"] == pytest.approx(float(np.abs(resid).mean()), abs=1e-4)


def test_learning_curve_bad_slice_domain_raises(spark):
    from proyecto_final_de_big_data_spark.operators.crossval import (
        learning_curve_linear,
    )

    df = spark.createDataFrame(
        [(i, 1.0, 2.0, 3.0) for i in range(50)], ["k", "x1", "x2", "y"]
    )
    with pytest.raises(Exception, match="slice expression"):
        learning_curve_linear(
            df, "x1", "x2", "y", F.pmod(F.col("k"), F.lit(3)), n_slices=4
        ).collect()
    with pytest.raises(ValueError, match="n_slices"):
        learning_curve_linear(df, "x1", "x2", "y", F.col("k"), n_slices=0)
