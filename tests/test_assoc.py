"""Categorical association + autocorrelation (operators/stats.py)."""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.stats import (
    autocorrelation,
    categorical_association,
)


def test_chi2_matches_hand_computation(spark):
    # 2x2 table: a=(x:30, y:10), b=(x:10, y:30)
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, "u string, v string")
    out = categorical_association(df, "u", "v").collect()[0]
    # e = 20 everywhere; chi2 = 4 * (10^2)/20 = 20
    assert out["n"] == 80
    assert out["dof"] == 1
    assert out["chi2"] == pytest.approx(20.0, abs=1e-6)
    assert out["cramers_v"] == pytest.approx(math.sqrt(20.0 / 80.0), abs=1e-6)
    # MI = sum p_ij ln(p_ij/(p_i p_j))
    mi = 2 * (0.375 * math.log(0.375 / 0.25) + 0.125 * math.log(0.125 / 0.25))
    assert out["mutual_info"] == pytest.approx(mi, abs=1e-6)


def test_independent_columns_near_zero(spark):
    # Perfectly independent layout -> chi2 == 0, MI == 0.
    rows = [(u, v) for u in "ab" for v in "xy" for _ in range(25)]
    df = spark.createDataFrame(rows, "u string, v string")
    out = categorical_association(df, "u", "v").collect()[0]
    assert out["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert out["mutual_info"] == pytest.approx(0.0, abs=1e-6)
    assert out["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_missing_cells_counted_in_chi2(spark):
    # (b, y) never observed; full-cross chi2 must include its expected
    # mass. Table: (a,x)=4 (a,y)=4 (b,x)=4 -> e(b,y)=8*4/12=4/3... hand:
    # r_a=8, r_b=4, c_x=8, c_y=4, n=12.
    rows = [("a", "x")] * 4 + [("a", "y")] * 4 + [("b", "x")] * 4
    df = spark.createDataFrame(rows, "u string, v string")
    out = categorical_association(df, "u", "v").collect()[0]
    e_ax, e_ay, e_bx, e_by = 8 * 8 / 12, 8 * 4 / 12, 4 * 8 / 12, 4 * 4 / 12
    chi2 = (
        (4 - e_ax) ** 2 / e_ax
        + (4 - e_ay) ** 2 / e_ay
        + (4 - e_bx) ** 2 / e_bx
        + (0 - e_by) ** 2 / e_by
    )
    assert out["chi2"] == pytest.approx(chi2, abs=1e-6)


def test_degenerate_single_level_is_null(spark):
    df = spark.createDataFrame([("a", "x"), ("a", "y")], "u string, v string")
    out = categorical_association(df, "u", "v").collect()[0]
    assert out["dof"] == 0
    assert out["chi2"] is None and out["cramers_v"] is None
    assert out["mutual_info"] is None


def test_grouped_and_null_rows_dropped(spark):
    rows = [("g1", "a", "x"), ("g1", "b", "y"), ("g1", None, "x"), ("g2", "a", "x")]
    df = spark.createDataFrame(rows, "g string, u string, v string")
    out = {
        r["g"]: r
        for r in (
            row.asDict()
            for row in categorical_association(df, "u", "v", by=["g"]).collect()
        )
    }
    assert out["g1"]["n"] == 2  # NULL u row dropped
    assert out["g2"]["dof"] == 0


def _acf_reference(xs, lag):
    n = len(xs)
    m = sum(xs) / n
    den = sum((v - m) ** 2 for v in xs)
    num = sum((xs[i] - m) * (xs[i + lag] - m) for i in range(n - lag))
    return num / den


def test_acf_matches_reference(spark):
    xs = [2.0, 4.0, 3.0, 7.0, 5.0, 8.0, 6.0, 9.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x double"
    )
    out = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in (
            row.asDict()
            for row in autocorrelation(df, ["k"], "t", "x", max_lag=3).collect()
        )
    }
    for lag in (1, 2, 3):
        assert out[lag][0] == len(xs) - lag
        assert out[lag][1] == pytest.approx(_acf_reference(xs, lag), abs=1e-6)


def test_acf_constant_series_null(spark):
    df = spark.createDataFrame(
        [("k", i, 5.0) for i in range(6)], "k string, t long, x double"
    )
    out = autocorrelation(df, ["k"], "t", "x", max_lag=2).collect()
    assert all(r["acf"] is None for r in out)


def test_acf_alternating_is_negative_at_lag1(spark):
    df = spark.createDataFrame(
        [("k", i, float((-1) ** i)) for i in range(10)],
        "k string, t long, x double",
    )
    out = {r["lag"]: r["acf"] for r in
           (row.asDict() for row in autocorrelation(df, ["k"], "t", "x", 2).collect())}
    assert out[1] < -0.8
    assert out[2] > 0.7


def test_acf_validates_args(spark):
    df = spark.createDataFrame([("k", 0, 1.0)], "k string, t long, x double")
    with pytest.raises(ValueError):
        autocorrelation(df, [], "t", "x")
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "t", "x", max_lag=0)
