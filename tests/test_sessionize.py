"""Batch sessionization (operators/sessionize.py)."""

from __future__ import annotations

import datetime as dt

from proyecto_final_de_big_data_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def _events(spark):
    rows = [
        # user 1: two sessions split by a 45-min silence
        (1, 1, _ts(0)),
        (2, 1, _ts(10)),
        (3, 1, _ts(55)),
        (4, 1, _ts(56)),
        # user 2: one session, gaps exactly AT the threshold stay joined
        (5, 2, _ts(0)),
        (6, 2, _ts(30)),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_gap_splits_sessions(spark):
    out = sessionize(_events(spark), "user_id", "ts", gap="30 minutes")
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1}  # gap == 30min joins


def test_session_stats_shapes(spark):
    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in session_stats(_events(spark), "user_id", "ts", gap="30 minutes").collect()
    }
    assert stats[(1, 1)] == (2, 600.0)
    assert stats[(1, 2)] == (2, 60.0)
    assert stats[(2, 1)] == (2, 1800.0)


def test_tie_break_keeps_equal_timestamps_together(spark):
    # three events at the identical instant after a big gap: all must
    # land in the SAME new session regardless of physical row order
    rows = [(i, 1, _ts(0)) for i in (1, 2, 3)] + [(j, 1, _ts(59)) for j in (6, 5, 4)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, "user_id", "ts", gap="30 minutes", order_cols=("event_id",))
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2}


def test_null_ts_rows_stay_visible_as_own_sessions(spark):
    rows = [(1, 1, None), (2, 1, None), (3, 1, _ts(0))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, "user_id", "ts", order_cols=("event_id",))
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    # each NULL-ts row opens its own session (NULLS FIRST), then real time
    assert got == {1: 1, 2: 2, 3: 3}
    assert out.count() == 3  # nothing silently dropped


def test_single_exchange_shared_by_both_window_passes(spark):
    plan = (
        session_stats(_events(spark), "user_id", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag probe + running counter + per-session agg all reuse the one
    # user_id shuffle: exactly one Exchange in the whole plan.
    assert plan.count("Exchange") == 1, plan
