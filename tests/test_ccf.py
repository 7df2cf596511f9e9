"""Cross-correlation function (operators/stats.py:cross_correlation).

Hand-worked fixture (mandatory discipline), one key, grid t = 1..4:

  x = [1, 3, 2, 4]   x_bar = 2.5   d_x = [-1.5,  0.5, -0.5,  1.5]
  y = [3, 2, 4, 0]   y_bar = 2.25  d_y = [ 0.75, -0.25, 1.75, -2.25]
  Sxx = 5.0   Syy = 8.75   den = sqrt(5.0 * 8.75) = sqrt(43.75)

  lag  0: sum d_x(t)*d_y(t)   = -1.125-0.125-0.875-3.375 = -5.5
  lag +1: sum d_x(t)*d_y(t+1) =  0.375+0.875+1.125       =  2.375
  lag -1: sum d_x(t)*d_y(t-1) =  0.375+0.125+2.625       =  3.125

  -> ccf(0) = -5.5/den, ccf(+1) = 2.375/den, ccf(-1) = 3.125/den —
  ASYMMETRIC in the lag sign (that asymmetry IS the lead/lag signal).
"""

from __future__ import annotations

import math
import random

import pytest

from proyecto_final_de_big_data_spark.operators.stats import cross_correlation

DEN = math.sqrt(5.0 * 8.75)


def _frame(spark):
    xs, ys = [1.0, 3.0, 2.0, 4.0], [3.0, 2.0, 4.0, 0.0]
    rows = [("a", t + 1, xs[t], ys[t]) for t in range(4)]
    rows.append(("a", 99, None, 1.0))  # half-NULL grid point: excluded
    return spark.createDataFrame(rows, "k string, t int, x double, y double")


def test_hand_worked_fixture(spark):
    out = {
        r["lag"]: r
        for r in cross_correlation(
            _frame(spark), ["k"], "t", "x", "y", max_lag=2
        ).collect()
    }
    assert set(out) == {-3, -2, -1, 0, 1, 2} - {-3, 3}  # lags -2..2
    assert out[0]["ccf"] == pytest.approx(round(-5.5 / DEN, 6), abs=2e-6)
    assert out[1]["ccf"] == pytest.approx(round(2.375 / DEN, 6), abs=2e-6)
    assert out[-1]["ccf"] == pytest.approx(round(3.125 / DEN, 6), abs=2e-6)
    assert out[0]["n_pairs"] == 4
    assert out[1]["n_pairs"] == 3 and out[-1]["n_pairs"] == 3
    assert out[2]["n_pairs"] == 2 and out[-2]["n_pairs"] == 2


def test_lag_zero_is_pearson_and_shift_detection(spark):
    # y is x delayed by 2 steps -> ccf peaks at lag +2 with value 1.
    rng = random.Random(11)
    xs = [rng.uniform(0, 10) for _ in range(60)]
    rows = [
        ("a", t, xs[t], xs[t - 2] if t >= 2 else None) for t in range(60)
    ]
    df = spark.createDataFrame(rows, "k string, t int, x double, y double")
    out = {
        r["lag"]: r["ccf"]
        for r in cross_correlation(df, ["k"], "t", "x", "y", max_lag=3).collect()
    }
    # x_t == y_{t+2} on the overlap, but means/vars are full-series:
    # the peak is at +2 and dominates every other lag.
    assert out[2] == max(out.values())
    assert out[2] > 0.9
    assert abs(out[0]) < 0.5


def test_global_no_keys(spark):
    out = cross_correlation(
        _frame(spark).filter("t < 99"), [], "t", "x", "y", max_lag=1
    ).collect()
    got = {r["lag"]: r["ccf"] for r in out}
    assert got[0] == pytest.approx(round(-5.5 / DEN, 6), abs=2e-6)
    assert set(got) == {-1, 0, 1}


def test_python_twin_raw_moments(spark):
    rng = random.Random(23)
    n = 50
    xs = [round(rng.gauss(5, 2), 3) for _ in range(n)]
    ys = [round(0.6 * xs[t] + rng.gauss(0, 1), 3) for t in range(n)]
    df = spark.createDataFrame(
        [("g", t, xs[t], ys[t]) for t in range(n)],
        "k string, t int, x double, y double",
    )
    got = {
        r["lag"]: (r["n_pairs"], r["ccf"])
        for r in cross_correlation(df, ["k"], "t", "x", "y", max_lag=4).collect()
    }
    mx, my = sum(xs) / n, sum(ys) / n
    den = math.sqrt(
        (sum(v * v for v in xs) - sum(xs) ** 2 / n)
        * (sum(v * v for v in ys) - sum(ys) ** 2 / n)
    )
    for lag in range(-4, 5):
        pairs = [
            (xs[t], ys[t + lag]) for t in range(n) if 0 <= t + lag < n
        ]
        num = (
            sum(a * b for a, b in pairs)
            - my * sum(a for a, _ in pairs)
            - mx * sum(b for _, b in pairs)
            + len(pairs) * mx * my
        )
        assert got[lag][0] == len(pairs)
        assert got[lag][1] == pytest.approx(round(num / den, 6), abs=2e-6)


def test_constant_series_null(spark):
    df = spark.createDataFrame(
        [("a", t, 5.0, float(t)) for t in range(5)],
        "k string, t int, x double, y double",
    )
    out = cross_correlation(df, ["k"], "t", "x", "y", max_lag=1).collect()
    assert all(r["ccf"] is None for r in out)


def test_bad_params_raise(spark):
    with pytest.raises(ValueError, match="max_lag"):
        cross_correlation(_frame(spark), ["k"], "t", "x", "y", max_lag=0)
