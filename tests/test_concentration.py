"""Unit tests for operators/concentration.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.concentration import lorenz_gini


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_perfect_equality_gini_zero(spark):
    out = lorenz_gini(
        _vals(spark, [5.0] * 100), "x", lo=0.0, hi=10.0, n_buckets=10
    ).collect()
    assert len(out) == 1
    assert out[0]["gini"] == 0.0
    assert out[0]["cum_value_share"] == 1.0 and out[0]["cum_pop_share"] == 1.0


def test_extreme_concentration_gini_near_one(spark):
    # 99 near-zero values + one huge one, in separate buckets.
    out = lorenz_gini(
        _vals(spark, [0.01] * 99 + [9.99]), "x", lo=0.0, hi=10.0,
        n_buckets=10,
    ).collect()
    # exact gini for this distribution: B = .99*.0901/2 + .01*(1.0901)/2
    # = .0501 -> gini = .8998 (the bucketing is trapezoid-exact here)
    gini = out[0]["gini"]
    assert gini == pytest.approx(0.8998, abs=1e-3)
    shares = [(r["cum_pop_share"], r["cum_value_share"]) for r in out]
    # Lorenz curve sits below the diagonal and is monotone
    assert all(v <= p + 1e-9 for p, v in shares)
    assert shares == sorted(shares)


def test_hand_computed_two_bucket_gini(spark):
    # 2 values of 1 and 2 values of 3: L = (0.25, 1.0) at pop (0.5, 1.0)
    out = {r["bucket"]: r for r in lorenz_gini(
        _vals(spark, [1.0, 1.0, 3.0, 3.0]), "x", lo=0.0, hi=4.0,
        n_buckets=4,
    ).collect()}
    lo_b = out[1]
    assert lo_b["cum_pop_share"] == 0.5 and lo_b["cum_value_share"] == 0.25
    # B = 0.5*(0+.25) + 0.5*(.25+1) = 0.75 -> gini = 1 - 0.75 = 0.25
    assert lo_b["gini"] == 0.25


def test_negative_value_hard_fails(spark):
    with pytest.raises(Exception) as e:
        lorenz_gini(
            _vals(spark, [1.0, -2.0]), "x", lo=0.0, hi=4.0
        ).collect()
    assert "non-negative" in str(e.value)


def test_validates_bounds(spark):
    df = _vals(spark, [1.0])
    with pytest.raises(ValueError):
        lorenz_gini(df, "x", lo=5.0, hi=5.0)
    with pytest.raises(ValueError):
        lorenz_gini(df, "x", lo=-1.0, hi=5.0)


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "x double")
    out = lorenz_gini(df, "x", lo=0.0, hi=2.0, n_buckets=2).collect()
    assert sum(r["n"] for r in out) == 1


def test_nan_values_excluded(spark):
    df = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
    out = lorenz_gini(df, "x", lo=0.0, hi=2.0, n_buckets=2).collect()
    assert sum(r["n"] for r in out) == 1
