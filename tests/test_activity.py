"""Rolling active users (operators/activity.py)."""

from __future__ import annotations

import datetime

import pytest

from proyecto_final_de_big_data_spark.operators.activity import rolling_active_users


def _run(spark, rows, w=7):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    return {
        r["day"].isoformat(): (r["dau"], r["wau"], r["stickiness"])
        for r in rolling_active_users(df, "user_id", "ts", window_days=w).collect()
    }


def _ts(d, h=10):
    return datetime.datetime(2024, 1, d, h)


def test_hand_checked_dau_wau(spark):
    # day 1: users {1,2}; day 2: {2}; day 5: {3}. Window 3 days:
    #   d1: dau 2, wau {1,2} = 2
    #   d2: dau 1, wau over d(-1)..2 -> {1,2} = 2
    #   d5: dau 1, wau over d3..5 -> {3} = 1
    rows = [(1, _ts(1)), (2, _ts(1)), (2, _ts(1, 12)), (2, _ts(2)), (3, _ts(5))]
    got = _run(spark, rows, w=3)
    assert got == {
        "2024-01-01": (2, 2, 1.0),
        "2024-01-02": (1, 2, 0.5),
        "2024-01-05": (1, 1, 1.0),
    }


def test_window_one_is_dau(spark):
    rows = [(1, _ts(1)), (2, _ts(1)), (1, _ts(2))]
    got = _run(spark, rows, w=1)
    assert all(d == w and s == 1.0 for (d, w, s) in got.values())


def test_multiple_events_per_day_count_once(spark):
    rows = [(1, _ts(1, h)) for h in range(1, 9)]
    got = _run(spark, rows, w=7)
    assert got == {"2024-01-01": (1, 1, 1.0)}


def test_null_rows_excluded_and_domain(spark):
    rows = [(1, _ts(1)), (None, _ts(1)), (2, None)]
    got = _run(spark, rows, w=7)
    assert got == {"2024-01-01": (1, 1, 1.0)}
    with pytest.raises(ValueError, match="window_days"):
        df = rolling_active_users(
            spark.createDataFrame(rows, "user_id long, ts timestamp"),
            "user_id", "ts", window_days=0,
        )


def test_wau_never_below_dau_on_fixture(spark, sf_dir):
    from proyecto_final_de_big_data_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = rolling_active_users(ev, "user_id", "ts", window_days=7).collect()
    assert len(rows) == 30
    for r in rows:
        assert r["wau"] >= r["dau"] > 0
        assert 0 < r["stickiness"] <= 1.0
