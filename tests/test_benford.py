"""Unit tests for operators/benford.py — lexical first-digit
extraction, exclusions, chi-square parts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.benford import (
    BENFORD_P,
    benford_profile,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_digits_extracted_lexically(spark):
    xs = [123.4, 0.0456, 9.99, 0.00001, -700.0, 1e-5, 25, 3]
    # digits: 1, 4, 9, 1, 7, 1, 2, 3
    out = {r["digit"]: r["n"] for r in benford_profile(
        spark, _vals(spark, xs), "x"
    ).collect()}
    assert out == {1: 3, 2: 1, 3: 1, 4: 1, 5: 0, 6: 0, 7: 1, 8: 0, 9: 1}


def test_power_of_ten_boundaries(spark):
    # The pow/log10 reconstruction misassigns these; the lexical path
    # must not.
    xs = [1000.0, 999.9999999999999, 0.1, 100.0, 9.999999999999998]
    out = {r["digit"]: r["n"] for r in benford_profile(
        spark, _vals(spark, xs), "x"
    ).collect()}
    assert out[1] == 3 and out[9] == 2


def test_zero_null_nan_excluded(spark):
    df = spark.createDataFrame(
        [(0.0,), (None,), (float("nan"),), (2.0,)], "x double"
    )
    out = benford_profile(spark, df, "x")
    assert out.agg(F.sum("n")).first()[0] == 1


def test_all_nine_digits_always_present(spark):
    out = benford_profile(spark, _vals(spark, [5.0]), "x")
    assert out.count() == 9
    assert [r["digit"] for r in out.collect()] == list(range(1, 10))


def test_expected_mass_and_chi2(spark):
    # 100 ones and nothing else: chi2 part for digit 1 is
    # n*(1-p1)^2/p1, for digit d>1 it's n*pd.
    out = {r["digit"]: r for r in benford_profile(
        spark, _vals(spark, [1.5] * 100), "x"
    ).collect()}
    p1 = BENFORD_P[1]
    assert out[1]["observed_frac"] == 1.0
    assert out[1]["expected_frac"] == pytest.approx(p1, abs=1e-6)
    assert out[1]["chi2_part"] == pytest.approx(
        100 * (1 - p1) ** 2 / p1, abs=1e-4
    )
    assert out[2]["chi2_part"] == pytest.approx(
        100 * BENFORD_P[2], abs=1e-4
    )
    total_expected = sum(BENFORD_P.values())
    assert total_expected == pytest.approx(1.0)
