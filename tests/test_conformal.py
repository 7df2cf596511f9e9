"""Split-conformal intervals (ml/conformal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.ml.conformal import split_conformal_profile


def _df(spark, cal_resids, test_resids):
    rows = [(1, 0.0, float(r)) for r in cal_resids] + [
        (0, 0.0, float(r)) for r in test_resids
    ]
    return spark.createDataFrame(rows, "is_cal int, pred double, y double")


def test_hand_checked_conformal_quantile(spark):
    # n=10 residuals 1..10, alpha=0.2 -> k = ceil(11*0.8) = 9 -> q = 9.
    # test residuals 5, 9.5, 12 -> covered 1 of 3.
    df = _df(spark, range(1, 11), [5, 9.5, 12])
    r = split_conformal_profile(
        df, "pred", "y", F.col("is_cal") == 1, alpha=0.2
    ).first()
    assert r["n_cal"] == 10 and r["k_order"] == 9
    assert r["q_hat"] == 9.0 and r["interval_width"] == 18.0
    assert r["n_test"] == 3 and r["n_covered"] == 1
    assert r["coverage"] == pytest.approx(1 / 3, abs=1e-6)


def test_coverage_guarantee_on_exchangeable_fixture(spark):
    # iid-ish residuals: empirical coverage on the test half must meet
    # ~1-alpha (within sampling noise of a 500-row split).
    rows = [
        (i % 2, 0.0, float((i * 7919) % 1000) / 10.0) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "is_cal int, pred double, y double")
    r = split_conformal_profile(
        df, "pred", "y", F.col("is_cal") == 1, alpha=0.1
    ).first()
    assert r["coverage"] >= 0.85


def test_approximate_path_is_conservative(spark):
    df = _df(spark, range(1, 101), range(1, 101))
    ex = split_conformal_profile(
        df, "pred", "y", F.col("is_cal") == 1, alpha=0.1
    ).first()
    ap = split_conformal_profile(
        df, "pred", "y", F.col("is_cal") == 1, alpha=0.1, exact=False
    ).first()
    # rank margin can only widen the interval -> coverage never drops
    assert ap["q_hat"] >= ex["q_hat"]
    assert ap["coverage"] >= ex["coverage"]


def test_too_small_calibration_raises(spark):
    df = _df(spark, [1.0, 2.0], [1.0])
    with pytest.raises(ValueError, match="too small"):
        split_conformal_profile(df, "pred", "y", F.col("is_cal") == 1, alpha=0.05)
    with pytest.raises(ValueError, match="alpha"):
        split_conformal_profile(df, "pred", "y", F.col("is_cal") == 1, alpha=1.5)


def test_null_nan_rows_excluded(spark):
    rows = [(1, 0.0, float(i)) for i in range(1, 11)]
    rows += [(1, None, 5.0), (1, 0.0, float("nan")), (0, 0.0, 3.0), (0, None, 1.0)]
    df = spark.createDataFrame(rows, "is_cal int, pred double, y double")
    r = split_conformal_profile(
        df, "pred", "y", F.col("is_cal") == 1, alpha=0.2
    ).first()
    assert r["n_cal"] == 10 and r["n_test"] == 1


def test_empty_test_split_keeps_the_fit(spark):
    # Fitting on a full-calibration split must not lose the radius.
    from pyspark.sql import functions as F

    df = _df(spark, range(1, 11), [])
    r = split_conformal_profile(
        df, "pred", "y", F.col("is_cal") == 1, alpha=0.2
    ).first()
    assert r["n_cal"] == 10 and r["q_hat"] == 9.0
    assert r["n_test"] == 0 and r["n_covered"] == 0
    assert r["coverage"] is None  # undefined, not fake
