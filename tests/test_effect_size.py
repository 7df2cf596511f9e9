"""Cohen's d / Hedges' g effect size (operators/abtest.py:effect_size).

Hand-worked fixture (mandatory discipline), key "K":

  a = [1, 2, 3]   n_a = 3, sum = 6, sumsq = 14, SSD_a = 14 - 12 = 2
  b = [2, 4]      n_b = 2, sum = 6, sumsq = 20, SSD_b = 20 - 18 = 2
  s_p^2 = (2 + 2)/(3 + 2 - 2) = 4/3      s_p = 1.154700...
  d = (2 - 3)/sqrt(4/3) = -0.866025...
  J = 1 - 3/(4*5 - 9) = 8/11 = 0.727272...
  g = d * 8/11 = -0.629837...
"""

from __future__ import annotations

import math
import random

import pytest

from proyecto_final_de_big_data_spark.operators.hyptest import effect_size

D = -1.0 / math.sqrt(4.0 / 3.0)


def _frame(spark):
    rows = [("K", "a", 1.0), ("K", "a", 2.0), ("K", "a", 3.0),
            ("K", "b", 2.0), ("K", "b", 4.0),
            # ignored rows: other group, NULL value, NULL key
            ("K", "c", 9.0), ("K", "a", None), (None, "b", 1.0),
            # degenerate keys
            ("one_sided", "a", 1.0), ("one_sided", "a", 2.0),
            ("tiny", "a", 1.0), ("tiny", "b", 2.0)]
    return spark.createDataFrame(rows, "k string, g string, v double")


def test_hand_worked_fixture(spark):
    out = {r["k"]: r for r in effect_size(
        _frame(spark), "v", "g", "a", "b", key_cols=["k"]).collect()}
    r = out["K"]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert (r["mean_a"], r["mean_b"], r["mean_diff"]) == (2.0, 3.0, -1.0)
    assert r["pooled_sd"] == round(math.sqrt(4.0 / 3.0), 6)
    assert r["cohens_d"] == round(D, 6)
    assert r["hedges_g"] == round(D * (8.0 / 11.0), 6)


def test_degenerate_arms_null(spark):
    out = {r["k"]: r for r in effect_size(
        _frame(spark), "v", "g", "a", "b", key_cols=["k"]).collect()}
    one = out["one_sided"]
    assert (one["n_a"], one["n_b"]) == (2, 0)
    assert one["cohens_d"] is None and one["mean_b"] is None
    tiny = out["tiny"]  # both arms singletons: no residual df
    assert (tiny["n_a"], tiny["n_b"]) == (1, 1)
    assert tiny["mean_diff"] == -1.0
    assert tiny["pooled_sd"] is None and tiny["hedges_g"] is None


def test_zero_variance_null(spark):
    df = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "g string, v double"
    )
    r = effect_size(df, "v", "g", "a", "b").collect()[0]
    assert r["pooled_sd"] == 0.0
    assert r["cohens_d"] is None


def test_global_one_row_and_sign(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 12.0), ("b", 1.0), ("b", 3.0)],
        "g string, v double",
    )
    rows = effect_size(df, "v", "g", "a", "b").collect()
    assert len(rows) == 1
    assert rows[0]["cohens_d"] > 0  # a larger -> positive


def test_python_twin_random(spark):
    rng = random.Random(29)
    rows = [("s", rng.choice(["a", "b"]), round(rng.gauss(3, 2), 3))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = effect_size(df, "v", "g", "a", "b", key_cols=["k"]).collect()[0]
    xa = [v for _, g, v in rows if g == "a"]
    xb = [v for _, g, v in rows if g == "b"]
    na, nb = len(xa), len(xb)
    ssd_a = sum(v * v for v in xa) - sum(xa) ** 2 / na
    ssd_b = sum(v * v for v in xb) - sum(xb) ** 2 / nb
    sp = math.sqrt((ssd_a + ssd_b) / (na + nb - 2))
    d = (sum(xa) / na - sum(xb) / nb) / sp
    g = d * (1 - 3.0 / (4 * (na + nb) - 9))
    assert got["cohens_d"] == pytest.approx(round(d, 6), abs=2e-6)
    assert got["hedges_g"] == pytest.approx(round(g, 6), abs=2e-6)


def test_same_labels_raise(spark):
    with pytest.raises(ValueError, match="distinct group labels"):
        effect_size(_frame(spark), "v", "g", "a", "a")
