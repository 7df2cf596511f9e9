"""Unit tests for operators/changepoint.py — detection of injected
level shifts, non-detection on stable series, determinism guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.changepoint import (
    cusum_changepoints,
)


def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, t, float(v)) for t, v in enumerate(vals)],
        "k string, t long, x double",
    )


def test_detects_upward_level_shift(spark):
    # baseline oscillates (sigma 0.5, mean 10), then a +1.5 level shift
    vals = [9.5, 10.5] * 10 + [11.5] * 20
    out = cusum_changepoints(
        _series(spark, vals), ["k"], "t", "x", k=0.25, h=3.0,
        baseline_points=20,
    ).collect()
    flagged = [r["t"] for r in out if r["is_change"]]
    assert flagged and min(flagged) >= 20  # alarms only after the shift
    assert all(r["cusum_pos"] >= 0 and r["cusum_neg"] <= 0 for r in out)


def test_detects_downward_shift_on_negative_track(spark):
    vals = [9.5, 10.5] * 10 + [8.5] * 20
    out = cusum_changepoints(
        _series(spark, vals), ["k"], "t", "x", k=0.25, h=3.0,
        baseline_points=20,
    ).collect()
    flagged = [r for r in out if r["is_change"]]
    assert flagged and all(r["cusum_neg"] < -3.0 for r in flagged)


def test_stable_series_never_alarms(spark):
    vals = [10.0, 10.5, 9.5] * 10  # bounded oscillation
    out = cusum_changepoints(
        _series(spark, vals), ["k"], "t", "x", k=0.5, h=5.0
    ).collect()
    assert not any(r["is_change"] for r in out)


def test_constant_baseline_degenerates_to_no_signal(spark):
    # sigma == 0 on the reference window means z is 0 by definition —
    # an explicit degeneration, never a divide-by-zero or a unit flip.
    vals = [10.0] * 10 + [99.0] * 10
    out = cusum_changepoints(
        _series(spark, vals), ["k"], "t", "x", baseline_points=10
    ).collect()
    assert all(r["cusum_pos"] == 0.0 and not r["is_change"] for r in out)


def test_constant_series_all_zero(spark):
    out = cusum_changepoints(
        _series(spark, [7.0] * 10), ["k"], "t", "x"
    ).collect()
    assert all(r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0 for r in out)
    assert not any(r["is_change"] for r in out)


def test_keys_are_independent(spark):
    a = [
        ("a", t, (9.5 if t % 2 else 10.5) + (5.0 if t >= 10 else 0.0))
        for t in range(20)
    ]
    b = [("b", t, 10.0) for t in range(20)]  # constant: sigma 0, z 0
    df = spark.createDataFrame(a + b, "k string, t long, x double")
    out = cusum_changepoints(
        df, ["k"], "t", "x", k=0.25, h=2.0, baseline_points=10
    ).collect()
    assert any(r["is_change"] for r in out if r["k"] == "a")
    assert not any(r["is_change"] for r in out if r["k"] == "b")


def test_row_count_preserved_and_sorted_fold(spark):
    vals = [3.0, 1.0, 2.0]
    out = cusum_changepoints(_series(spark, vals), ["k"], "t", "x").collect()
    assert len(out) == 3
    assert sorted(r["t"] for r in out) == [0, 1, 2]


def test_validates_parameters(spark):
    df = _series(spark, [1.0])
    with pytest.raises(ValueError):
        cusum_changepoints(df, [], "t", "x")
    with pytest.raises(ValueError):
        cusum_changepoints(df, ["k"], "t", "x", k=-1.0)
    with pytest.raises(ValueError):
        cusum_changepoints(df, ["k"], "t", "x", h=0.0)
    with pytest.raises(ValueError):
        cusum_changepoints(df, ["k"], "t", "x", baseline_points=1)


def test_retrospective_mode_flags_both_sides_of_a_shift(spark):
    # Without a baseline the pooled mean sits between the two levels:
    # both halves drift, which is the documented retrospective reading.
    vals = [10.0] * 20 + [11.0] * 20
    out = cusum_changepoints(
        _series(spark, vals), ["k"], "t", "x", k=0.25, h=3.0
    ).collect()
    assert any(r["is_change"] and r["t"] < 20 for r in out)
    assert any(r["is_change"] and r["t"] >= 20 for r in out)


def test_max_points_guard_raises(spark):
    df = _series(spark, range(50))
    with pytest.raises(Exception) as e:
        cusum_changepoints(df, ["k"], "t", "x", max_points=10).collect()
    assert "max_points" in str(e.value)


def test_null_values_excluded_not_collapsing_z(spark):
    rows = [("k", t, (9.5 if t % 2 else 10.5)) for t in range(10)]
    df = spark.createDataFrame(
        rows + [("k", 10, None), ("k", 11, 20.0)], "k string, t long, x double"
    )
    out = cusum_changepoints(
        df, ["k"], "t", "x", k=0.25, h=2.0, baseline_points=10
    ).collect()
    assert len(out) == 11  # NULL row excluded, not poisoning
    assert any(r["is_change"] for r in out if r["t"] == 11)
