"""PACF via unrolled Durbin-Levinson (operators/stats.py:pacf_by_key).

Hand-worked fixture (mandatory discipline), x = [1..5] at t = 1..5,
worked in EXACT fractions (d = [-2,-1,0,1,2], SS = 10):

  r1 = 4/10 = 2/5      r2 = -1/10      r3 = -4/10      r4 = -4/10
  p1 = 2/5
  p2 = (r2 - r1^2)/(1 - r1^2) = (-1/10 - 4/25)/(21/25) = -13/42
  phi21 = r1(1 - p2) = 2/5 * 55/42 = 11/21
  num3 = r3 - phi21*r2 - p2*r1 = -2/5 + 11/210 + 26/210 = -47/210
  den3 = 1 - phi21*r1 - p2*r2 = 1 - 22/105 - 13/420 = 319/420
  p3 = -47/210 * 420/319 = -94/319

p4 and the random-series case are checked against a pure-Python
fractions.Fraction Durbin-Levinson twin (no float drift at all).
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from proyecto_final_de_big_data_spark.operators.stats import pacf_by_key


def _dl_twin(xs: list[float], max_lag: int = 4) -> list[Fraction | None]:
    """Durbin-Levinson over exact-fraction ACF values."""
    n = len(xs)
    fx = [Fraction(x).limit_denominator(10**9) for x in xs]
    m = sum(fx) / n
    d = [x - m for x in fx]
    ss = sum(v * v for v in d)
    r = {
        k: sum(d[i] * d[i + k] for i in range(n - k)) / ss
        for k in range(1, max_lag + 1)
    }
    phis: dict[int, dict[int, Fraction]] = {1: {1: r[1]}}
    out: list[Fraction | None] = [r[1]]
    for k in range(2, max_lag + 1):
        prev = phis[k - 1]
        num = r[k] - sum(prev[j] * r[k - j] for j in range(1, k))
        den = 1 - sum(prev[j] * r[j] for j in range(1, k))
        if den == 0:
            out.append(None)
            break
        pkk = num / den
        phis[k] = {j: prev[j] - pkk * prev[k - j] for j in range(1, k)}
        phis[k][k] = pkk
        out.append(pkk)
    return out


def test_hand_worked_fractions(spark):
    df = spark.createDataFrame(
        [("a", t, float(t)) for t in range(1, 6)], "k string, t int, v double"
    )
    got = {r["lag"]: r["pacf"] for r in
           pacf_by_key(df, ["k"], "t", "v", max_lag=4).collect()}
    assert got[1] == round(2.0 / 5.0, 6)
    assert got[2] == round(-13.0 / 42.0, 6)
    assert got[3] == pytest.approx(round(-94.0 / 319.0, 6), abs=2e-6)
    twin = _dl_twin([1.0, 2.0, 3.0, 4.0, 5.0])
    assert got[4] == pytest.approx(round(float(twin[3]), 6), abs=2e-6)


def test_python_twin_random_series(spark):
    import random

    rng = random.Random(43)
    xs, x = [], 0.0
    for _ in range(60):
        x = 0.7 * x + rng.gauss(0, 1)
        xs.append(round(x, 3))
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(xs)], "k string, t int, v double"
    )
    got = {r["lag"]: r["pacf"] for r in
           pacf_by_key(df, ["k"], "t", "v", max_lag=4).collect()}
    twin = _dl_twin(xs)
    for lag in range(1, 5):
        assert got[lag] == pytest.approx(
            round(float(twin[lag - 1]), 6), abs=5e-6
        )


def test_ar1_signature_cutoff(spark):
    # AR(1): PACF at lag 1 is large, lags 2+ are near zero — the
    # order-selection signature this operator exists to read.
    import random

    rng = random.Random(3)
    xs, x = [], 0.0
    for _ in range(800):
        x = 0.8 * x + rng.gauss(0, 1)
        xs.append(x)
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(xs)], "k string, t int, v double"
    )
    got = {r["lag"]: r["pacf"] for r in
           pacf_by_key(df, ["k"], "t", "v", max_lag=4).collect()}
    assert got[1] > 0.7
    for lag in (2, 3, 4):
        assert abs(got[lag]) < 0.12


def test_constant_series_all_null(spark):
    df = spark.createDataFrame(
        [("c", t, 5.0) for t in range(10)], "k string, t int, v double"
    )
    rows = pacf_by_key(df, ["k"], "t", "v", max_lag=3).collect()
    assert len(rows) == 3
    assert all(r["pacf"] is None for r in rows)


def test_short_series_missing_acf_propagates_null(spark):
    # 3 points: lag-3 ACF has no pairs -> r3 NULL -> pacf(3) NULL,
    # while lags 1-2 still compute.
    df = spark.createDataFrame(
        [("s", 1, 1.0), ("s", 2, 3.0), ("s", 3, 2.0)],
        "k string, t int, v double",
    )
    got = {r["lag"]: r["pacf"] for r in
           pacf_by_key(df, ["k"], "t", "v", max_lag=3).collect()}
    assert got[1] is not None and got[2] is not None
    assert got[3] is None


def test_bad_params_raise(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "k string, t int, v double")
    with pytest.raises(ValueError, match="key column"):
        pacf_by_key(df, [], "t", "v")
    with pytest.raises(ValueError, match="lag 4"):
        pacf_by_key(df, ["k"], "t", "v", max_lag=9)
