"""Difference-in-differences (operators/abtest.py:
difference_in_differences).

Hand-worked fixture (the mandatory hand-fixture discipline), exact
binary arithmetic throughout:

    cell            units       n   mean   sample var
    control  pre    10, 12      2   11     2
    control  post   11, 15      2   13     8
    treat    pre    20, 22      2   21     2
    treat    post   30, 36      2   33     18

    diff_control   = 13 − 11 = 2
    diff_treatment = 33 − 21 = 12
    did            = 12 − 2  = 10
    se  = sqrt(18/2 + 2/2 + 8/2 + 2/2) = sqrt(15) = 3.872983...
    z   = 10 / sqrt(15)                            = 2.581989...

(The design is Card & Krueger 1994's two-group/two-period employment
study; the numbers here are hand-built so every intermediate is
checkable by eye.)
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.abtest import (
    difference_in_differences,
)


def _units(spark, rows):
    return spark.createDataFrame(rows, "g string, p string, y double")


FIXTURE = [
    ("c", "pre", 10.0),
    ("c", "pre", 12.0),
    ("c", "post", 11.0),
    ("c", "post", 15.0),
    ("t", "pre", 20.0),
    ("t", "pre", 22.0),
    ("t", "post", 30.0),
    ("t", "post", 36.0),
]


def test_hand_worked_fixture_exact(spark):
    row = difference_in_differences(
        _units(spark, FIXTURE), "g", "p", "y", "c", "t", "pre", "post"
    ).collect()[0]
    assert (row["n_control_pre"], row["n_control_post"]) == (2, 2)
    assert (row["mean_control_pre"], row["mean_control_post"]) == (11.0, 13.0)
    assert (row["mean_treatment_pre"], row["mean_treatment_post"]) == (21.0, 33.0)
    assert (row["diff_control"], row["diff_treatment"]) == (2.0, 12.0)
    assert row["did"] == 10.0
    assert row["se"] == round(math.sqrt(15.0), 6)
    assert row["z_stat"] == round(10.0 / math.sqrt(15.0), 6)
    assert row["significant"] == 1
    assert row["ci_low"] == round(10.0 - 1.959963984540054 * math.sqrt(15.0), 6)
    assert row["ci_high"] == round(10.0 + 1.959963984540054 * math.sqrt(15.0), 6)


def test_shared_time_shock_nets_out(spark):
    # Both arms shift by +5 post: did must be exactly 0, not significant.
    rows = [
        ("c", "pre", 10.0), ("c", "pre", 14.0),
        ("c", "post", 15.0), ("c", "post", 19.0),
        ("t", "pre", 30.0), ("t", "pre", 34.0),
        ("t", "post", 35.0), ("t", "post", 39.0),
    ]
    row = difference_in_differences(
        _units(spark, rows), "g", "p", "y", "c", "t", "pre", "post"
    ).collect()[0]
    assert row["did"] == 0.0
    assert row["significant"] == 0


def test_null_nan_metric_excluded(spark):
    rows = FIXTURE + [("c", "pre", None), ("t", "post", float("nan"))]
    row = difference_in_differences(
        _units(spark, rows), "g", "p", "y", "c", "t", "pre", "post"
    ).collect()[0]
    assert row["n_control_pre"] == 2 and row["n_treatment_post"] == 2
    assert row["did"] == 10.0


def test_validation_errors(spark):
    df = _units(spark, FIXTURE)
    with pytest.raises(ValueError, match="control == treatment"):
        difference_in_differences(df, "g", "p", "y", "c", "c", "pre", "post")
    with pytest.raises(ValueError, match="pre == post"):
        difference_in_differences(df, "g", "p", "y", "c", "t", "pre", "pre")
    thin = _units(spark, FIXTURE[:-1])  # treatment/post has 1 unit
    # cell validation is in-plan (raise_error) since r11: fires at action
    with pytest.raises(Exception, match="period='post'"):
        difference_in_differences(
            thin, "g", "p", "y", "c", "t", "pre", "post"
        ).collect()
    # A label matching no rows is the same <2-units failure, not a crash.
    with pytest.raises(Exception, match=">=2 usable units"):
        difference_in_differences(
            df, "g", "p", "y", "c", "t", "pre", "later"
        ).collect()
