"""Multi-touch attribution (operators/attribution.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from proyecto_final_de_big_data_spark.operators.attribution import (
    conversion_attribution,
)


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = conversion_attribution(
        df, "user_id", "ts", "event_type", "event_id",
        conversion_type="purchase", touch_types=["click", "view"],
    )
    return {r["channel"]: r.asDict() for r in out.collect()}


def test_single_conversion_credit_split(spark):
    rows = [
        (1, _ts(1), "view", 1),
        (1, _ts(2), "click", 2),
        (1, _ts(3), "view", 3),
        (1, _ts(4), "purchase", 4),
    ]
    got = _run(spark, rows)
    # first touch: view@1; last touch: view@3; linear: view 2/3, click 1/3
    assert got["view"]["first_touch"] == 1
    assert got["view"]["last_touch"] == 1
    assert got["click"]["first_touch"] == 0
    assert got["click"]["last_touch"] == 0
    assert got["view"]["linear_credit"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["click"]["linear_credit"] == pytest.approx(1 / 3, abs=1e-6)


def test_touches_split_between_conversions(spark):
    rows = [
        (1, _ts(1), "click", 1),
        (1, _ts(2), "purchase", 2),
        (1, _ts(3), "view", 3),
        (1, _ts(4), "purchase", 4),
        (1, _ts(5), "click", 5),  # after last conversion: no credit
    ]
    got = _run(spark, rows)
    assert got["click"]["first_touch"] == 1  # conv 1
    assert got["view"]["first_touch"] == 1   # conv 2
    assert got["click"]["n_touches"] == 1    # trailing click dropped
    assert got["click"]["linear_credit"] == pytest.approx(1.0, abs=1e-6)
    assert got["view"]["linear_credit"] == pytest.approx(1.0, abs=1e-6)


def test_same_ts_touch_attaches_to_conversion(spark):
    rows = [
        (1, _ts(1), "view", 1),
        (1, _ts(2), "click", 2),
        (1, _ts(2), "purchase", 3),  # same minute as the click
    ]
    got = _run(spark, rows)
    assert got["click"]["last_touch"] == 1
    assert got["view"]["first_touch"] == 1


def test_conversion_without_touches_earns_nothing(spark):
    rows = [
        (1, _ts(1), "purchase", 1),
        (2, _ts(1), "view", 2),
        (2, _ts(2), "purchase", 3),
    ]
    got = _run(spark, rows)
    assert got["view"]["first_touch"] == 1
    assert got["view"]["linear_credit"] == pytest.approx(1.0, abs=1e-6)
    assert "purchase" not in got


def test_users_are_independent(spark):
    rows = [
        (1, _ts(1), "click", 1),
        (2, _ts(2), "purchase", 2),  # other user's conversion
        (1, _ts(3), "purchase", 3),
        (2, _ts(0), "view", 4),
    ]
    got = _run(spark, rows)
    assert got["click"]["first_touch"] == 1
    assert got["view"]["first_touch"] == 1


def test_validates_touch_types(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), "view", 1)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    with pytest.raises(ValueError):
        conversion_attribution(
            df, "user_id", "ts", "event_type", "event_id", "purchase", []
        )
