"""Mann-Kendall trend + Sen's slope (operators/trend.py:mann_kendall).

Hand-worked fixture (mandatory discipline), key "A", x = [3, 1, 2, 4]
at t = 1..4 (no value ties):

  pair signs: (3,1)- (3,2)- (3,4)+ (1,2)+ (1,4)+ (2,4)+  ->  S = 2
  Var(S) = 4*3*13/18 = 26/3 = 8.666667
  z = (2-1)/sqrt(26/3) = 0.339683...   -> no_trend
  pairwise slopes sorted: [-2, -0.5, 1/3, 1, 1.5, 2]
  sen = (1/3 + 1)/2 = 0.666667

Key "T", x = [1, 2, 2, 3] (one tie group of 2):

  S = 5; tie term = 2*1*9 = 18; Var = (156 - 18)/18 = 23/3 = 7.666667
  z = 4/sqrt(23/3) = 1.444557...  -> no_trend (just under 1.96)
  slopes sorted: [0, 0.5, 0.5, 2/3, 1, 1] -> sen = (0.5 + 2/3)/2
"""

from __future__ import annotations

import math
import random

import pytest

from proyecto_final_de_big_data_spark.operators.trend import mann_kendall


def _frame(spark):
    rows = [("A", t + 1, x) for t, x in enumerate([3.0, 1.0, 2.0, 4.0])]
    rows += [("T", t + 1, x) for t, x in enumerate([1.0, 2.0, 2.0, 3.0])]
    rows += [("up", t, float(t)) for t in range(1, 11)]      # strict rise
    rows += [("flat", t, 7.0) for t in range(1, 6)]          # all tied
    return spark.createDataFrame(rows, "k string, t int, v double")


def test_hand_worked_fixtures(spark):
    out = {r["k"]: r for r in
           mann_kendall(_frame(spark), ["k"], "t", "v").collect()}

    a = out["A"]
    assert (a["n"], a["s_stat"]) == (4, 2)
    assert a["var_s"] == round(26.0 / 3.0, 6)
    assert a["z"] == round(1.0 / math.sqrt(26.0 / 3.0), 6)
    assert a["trend"] == "no_trend"
    assert a["sen_slope"] == round((1.0 / 3.0 + 1.0) / 2.0, 6)

    t = out["T"]
    assert t["s_stat"] == 5
    assert t["var_s"] == round(23.0 / 3.0, 6)
    assert t["z"] == round(4.0 / math.sqrt(23.0 / 3.0), 6)
    assert t["sen_slope"] == round((0.5 + 2.0 / 3.0) / 2.0, 6)


def test_strict_rise_is_increasing_and_flat_is_null(spark):
    out = {r["k"]: r for r in
           mann_kendall(_frame(spark), ["k"], "t", "v").collect()}
    up = out["up"]
    assert up["s_stat"] == 45  # C(10,2) all positive
    assert up["trend"] == "increasing"
    assert up["sen_slope"] == 1.0
    flat = out["flat"]
    assert flat["var_s"] == 0.0
    assert flat["z"] is None and flat["trend"] is None
    assert flat["sen_slope"] == 0.0


def test_decreasing_detected(spark):
    df = spark.createDataFrame(
        [("d", t, float(20 - t)) for t in range(1, 12)],
        "k string, t int, v double",
    )
    r = mann_kendall(df, ["k"], "t", "v").collect()[0]
    assert r["s_stat"] == -55
    assert r["trend"] == "decreasing"
    assert r["sen_slope"] == -1.0


def test_python_twin_random(spark):
    rng = random.Random(41)
    xs = [round(rng.uniform(0, 5) + 0.1 * t, 2) for t in range(40)]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs)], "k string, t int, v double"
    )
    got = mann_kendall(df, ["k"], "t", "v").collect()[0]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter
    tie = sum(c * (c - 1) * (2 * c + 5) for c in Counter(xs).values())
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    )
    m = len(slopes)
    sen = (slopes[m // 2 - 1] + slopes[m // 2]) / 2 if m % 2 == 0 else slopes[m // 2]
    assert got["s_stat"] == s
    assert got["var_s"] == pytest.approx(round(var, 6), abs=2e-6)
    assert got["z"] == pytest.approx(round(z, 6), abs=2e-6)
    assert got["sen_slope"] == pytest.approx(round(sen, 6), abs=2e-6)


def test_duplicate_timestamps_hard_fail(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)],
        "k string, t int, v double",
    )
    with pytest.raises(Exception, match="duplicate grid points|ill-defined"):
        mann_kendall(df, ["k"], "t", "v").collect()


def test_max_points_guard(spark):
    df = spark.createDataFrame(
        [("a", t, float(t)) for t in range(200)], "k string, t int, v double"
    )
    # the guard is in-plan (raise_error broadcast filter) since r11:
    # it fires at action time, before the O(n²) pair join can run
    with pytest.raises(Exception, match="max_points"):
        mann_kendall(df, ["k"], "t", "v", max_points=100).collect()


def test_needs_keys(spark):
    with pytest.raises(ValueError, match="key column"):
        mann_kendall(_frame(spark), [], "t", "v")
