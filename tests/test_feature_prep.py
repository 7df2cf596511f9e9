"""Unit tests for operators/woe.py and operators/encode.py — hand-
checkable WOE/IV algebra and leakage-safety of the LOO encoding."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.encode import target_encode_loo
from proyecto_final_de_big_data_spark.operators.woe import woe_iv


def _labeled(spark, rows):
    return spark.createDataFrame(rows, "c string, y boolean")


def test_woe_hand_checked(spark):
    # a: 3 pos / 1 neg; b: 1 pos / 3 neg. tp=4, tn=4.
    rows = [("a", True)] * 3 + [("a", False)] + [("b", True)] + [
        ("b", False)
    ] * 3
    out = {r["category"]: r for r in woe_iv(
        _labeled(spark, rows), "c", "y"
    ).collect()}
    assert out["a"]["pos_share"] == 0.75 and out["a"]["neg_share"] == 0.25
    assert out["a"]["woe"] == round(math.log(3.0), 6)
    assert out["a"]["iv_part"] == round(0.5 * math.log(3.0), 6)
    assert out["b"]["woe"] == round(math.log(1 / 3), 6)
    # IV is symmetric here: both levels contribute equally
    assert out["a"]["iv_part"] == out["b"]["iv_part"]


def test_woe_zero_cell_null_without_smoothing(spark):
    rows = [("a", True), ("a", True), ("b", False)]
    out = {r["category"]: r for r in woe_iv(
        _labeled(spark, rows), "c", "y"
    ).collect()}
    assert out["a"]["woe"] is None and out["b"]["woe"] is None
    assert out["a"]["iv_part"] is None


def test_woe_laplace_smoothing_defines_zero_cells(spark):
    rows = [("a", True), ("a", True), ("b", False)]
    out = {r["category"]: r for r in woe_iv(
        _labeled(spark, rows), "c", "y", laplace=0.5
    ).collect()}
    # a: pos (2+.5)/(2+1)= .833..., neg (0+.5)/(1+1)=0.25
    assert out["a"]["woe"] == round(math.log((2.5 / 3) / 0.25), 6)
    assert out["b"]["woe"] is not None


def test_woe_null_labels_excluded(spark):
    df = spark.createDataFrame(
        [("a", True), ("a", None), ("b", False)], "c string, y boolean"
    )
    out = {r["category"]: r for r in woe_iv(df, "c", "y").collect()}
    assert out["a"]["n"] == 1  # the NULL-label row is gone entirely


def test_woe_rejects_negative_laplace(spark):
    with pytest.raises(ValueError):
        woe_iv(_labeled(spark, [("a", True)]), "c", "y", laplace=-1.0)


def _targets(spark, rows):
    return spark.createDataFrame(rows, "id long, c string, y double")


def test_loo_excludes_own_row(spark):
    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0)]
    out = {r["id"]: r["enc"] for r in target_encode_loo(
        _targets(spark, rows), "c", "y"
    ).collect()}
    assert out[1] == 25.0  # (20+30)/2
    assert out[2] == 20.0  # (10+30)/2
    assert out[3] == 15.0
    assert out[4] is None  # singleton without a prior


def test_loo_prior_blends_singletons(spark):
    rows = [(1, "a", 10.0), (2, "a", 30.0), (3, "b", 100.0)]
    # global mean = 140/3
    out = {r["id"]: r["enc"] for r in target_encode_loo(
        _targets(spark, rows), "c", "y", prior_weight=1.0
    ).collect()}
    mu = 140.0 / 3
    assert out[3] == round((0.0 + mu) / 1.0, 6)
    assert out[1] == round((30.0 + mu) / 2.0, 6)


def test_loo_null_category_is_its_own_level(spark):
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 5.0)],
        "id long, c string, y double",
    )
    out = {r["id"]: r["enc"] for r in target_encode_loo(df, "c", "y").collect()}
    assert out[1] == 20.0 and out[2] == 10.0


def test_loo_null_target_gets_null_and_does_not_pollute(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, "a", 30.0)],
        "id long, c string, y double",
    )
    out = {r["id"]: r["enc"] for r in target_encode_loo(df, "c", "y").collect()}
    assert out[2] is None
    assert out[1] == 30.0 and out[3] == 10.0  # NULL row not in sums/counts


def test_loo_nan_target_excluded_like_null(spark):
    # ADVICE r7: one NaN target must not poison the category sum (every
    # sibling row would encode to NaN); it behaves exactly like NULL.
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", float("nan")), (3, "a", 30.0)],
        "id long, c string, y double",
    )
    out = {r["id"]: r["enc"] for r in target_encode_loo(df, "c", "y").collect()}
    assert out[2] is None
    assert out[1] == 30.0 and out[3] == 10.0
