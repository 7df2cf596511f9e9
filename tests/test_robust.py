"""Median/MAD robust outlier profile (operators/robust.py)."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.robust import (
    MAD_CONSISTENCY,
    mad_outlier_profile,
)


def _profile(spark, rows, schema="g string, x double", **kw):
    df = spark.createDataFrame(rows, schema)
    out = mad_outlier_profile(df, "x", by=["g"], **kw)
    return {r["g"]: r for r in (row.asDict() for row in out.collect())}


def test_flags_gross_outlier_not_inliers(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    got = _profile(spark, [("a", v) for v in vals])
    r = got["a"]
    # median of 6 values interpolates the middle pair: (12+13)/2
    assert r["median"] == 12.5
    assert r["n"] == 6 and r["n_outliers"] == 1
    assert r["outlier_frac"] == pytest.approx(1 / 6, abs=1e-6)


def test_stddev_zscore_would_have_missed_it(spark):
    # The classic failure: one huge outlier inflates stddev so much
    # that |x-mean| < 3*stddev for every point -- MAD still flags it.
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    assert all(abs(v - mean) < 3 * var**0.5 for v in vals)
    got = _profile(spark, [("a", v) for v in vals])
    assert got["a"]["n_outliers"] == 1


def test_fence_is_k_sigma_units(spark):
    # MAD of {0,1,2,...,8} around median 4 is 2; fence k*1.4826*2.
    vals = [float(v) for v in range(9)]
    got = _profile(spark, [("a", v) for v in vals], k=1.0)
    fence = 1.0 * MAD_CONSISTENCY * 2.0
    expected = sum(1 for v in vals if abs(v - 4.0) > fence)
    assert got["a"]["mad"] == 2.0
    assert got["a"]["n_outliers"] == expected


def test_nulls_ignored_everywhere(spark):
    got = _profile(
        spark, [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None)]
    )
    assert got["a"]["n"] == 3
    assert got["a"]["median"] == 2.0
    assert got["a"]["n_outliers"] == 0


def test_zero_mad_flags_everything_off_median(spark):
    got = _profile(
        spark, [("a", 5.0), ("a", 5.0), ("a", 5.0), ("a", 5.1)]
    )
    assert got["a"]["mad"] == 0.0
    assert got["a"]["n_outliers"] == 1


def test_groups_independent_and_approx_mode_runs(spark):
    rows = [("a", float(v)) for v in range(100)] + [("b", 7.0), ("b", 7.5)]
    exact = _profile(spark, rows)
    approx = _profile(spark, rows, exact=False)
    assert exact["b"]["n_outliers"] == 0
    # the sketch returns an actual data value (no interpolation):
    # within one grid step of the exact interpolated median here
    assert abs(exact["a"]["median"] - approx["a"]["median"]) <= 1.0


# ------------------------------------------------------ robust scaler


def test_robust_scale_hand_checked(spark):
    from proyecto_final_de_big_data_spark.operators.robust import robust_scale

    # values 1..5: median 3, IQR = 4 - 2 = 2 -> scaled (x-3)/2
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "x double")
    got = sorted(
        r["x_scaled"] for r in robust_scale(df, ["x"]).collect()
    )
    assert got == [-1.0, -0.5, 0.0, 0.5, 1.0]


def test_robust_scale_outlier_immunity(spark):
    # A huge outlier must not change the scale of the bulk (that is
    # the point): only ITS OWN scaled value is extreme.
    from proyecto_final_de_big_data_spark.operators.robust import robust_scale

    clean = spark.createDataFrame([(float(i),) for i in range(1, 6)], "x double")
    dirty = spark.createDataFrame(
        [(float(i),) for i in range(1, 6)] + [(1e9,)], "x double"
    )
    want = {
        r["x"]: r["x_scaled"] for r in robust_scale(clean, ["x"]).collect()
    }
    got = {
        r["x"]: r["x_scaled"] for r in robust_scale(dirty, ["x"]).collect()
    }
    for v in (1.0, 2.0, 3.0):
        assert abs(got[v] - want[v]) < 0.6  # bulk barely moves
    assert got[1e9] > 1e8  # the outlier itself is off the charts


def test_robust_scale_degenerate_iqr_null(spark):
    from proyecto_final_de_big_data_spark.operators.robust import robust_scale

    df = spark.createDataFrame([(5.0,)] * 10 + [(7.0,)], "x double")
    rows = robust_scale(df, ["x"]).collect()
    assert all(r["x_scaled"] is None for r in rows)  # IQR 0 -> NULL, not inf


def test_robust_scale_grouped_and_null_group(spark):
    from proyecto_final_de_big_data_spark.operators.robust import robust_scale

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), (None, 10.0), (None, 20.0), (None, 30.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r["g"], r["x"]): r["x_scaled"] for r in robust_scale(df, ["x"], by=["g"]).collect()}
    assert got[("a", 2.0)] == 0.0 and got[(None, 20.0)] == 0.0
    assert got[("a", 3.0)] == 1.0 and got[(None, 30.0)] == 1.0


def test_robust_scale_validates(spark):
    import pytest

    from proyecto_final_de_big_data_spark.operators.robust import robust_scale

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="at least one"):
        robust_scale(df, [])
