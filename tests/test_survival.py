"""Kaplan-Meier estimator (operators/survival.py)."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.survival import kaplan_meier


def _km(spark, rows, by=None):
    schema = "duration double, event int"
    if by:
        schema = "g string, " + schema
    df = spark.createDataFrame(rows, schema)
    return {
        tuple(r[c] for c in (by or [])) + (r["duration"],): r
        for r in (
            row.asDict()
            for row in kaplan_meier(df, "duration", "event", by=by).collect()
        )
    }


def test_textbook_curve(spark):
    # durations 1e, 2e, 3c, 4e, 5c -> S = .8, .6, .6, .3, .3
    got = _km(
        spark,
        [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 1), (5.0, 0)],
    )
    assert got[(1.0,)]["n_at_risk"] == 5 and got[(1.0,)]["survival"] == 0.8
    assert got[(2.0,)]["n_at_risk"] == 4 and got[(2.0,)]["survival"] == 0.6
    # censoring-only time keeps the running survival unchanged
    assert got[(3.0,)]["n_events"] == 0 and got[(3.0,)]["survival"] == 0.6
    assert got[(4.0,)]["n_at_risk"] == 2 and got[(4.0,)]["survival"] == 0.3
    assert got[(5.0,)]["n_censored"] == 1 and got[(5.0,)]["survival"] == 0.3


def test_censoring_raises_curve_vs_naive_drop(spark):
    # Treating the censored subject as an event at t=3 would give
    # S(3) = .25; KM keeps it at .5 * .666667... ~= .333 -- but the real
    # assertion is that censoring does NOT multiply a factor in.
    got = _km(spark, [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 1)])
    assert got[(3.0,)]["survival"] == got[(2.0,)]["survival"]


def test_absorbing_zero_when_all_die(spark):
    got = _km(spark, [(1.0, 1), (1.0, 1)])
    assert got[(1.0,)]["n_events"] == 2
    assert got[(1.0,)]["survival"] == 0.0
    # absorption can only hit the final duration (any subject with a
    # longer duration is still at risk earlier, so d < n before then):
    # a lone final event empties the risk set -> exact 0, no ln(0).
    got = _km(spark, [(1.0, 0), (2.0, 1)])
    assert got[(2.0,)]["n_at_risk"] == 1
    assert got[(2.0,)]["survival"] == 0.0


def test_tied_event_and_censor_share_risk_set(spark):
    # Standard convention: a subject censored at t is still at risk at
    # t, so d=1, n=3 at t=2 -> factor 2/3.
    got = _km(spark, [(1.0, 1), (2.0, 1), (2.0, 0)])
    assert got[(2.0,)]["n_at_risk"] == 2
    # t=1: n=3, d=1 -> 2/3; t=2: n=2, d=1 (censor in same row) -> 1/2
    assert got[(1.0,)]["survival"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[(2.0,)]["survival"] == pytest.approx(1 / 3, abs=1e-6)


def test_grouped_curves_are_independent(spark):
    got = _km(
        spark,
        [("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 0), ("b", 2.0, 1)],
        by=["g"],
    )
    assert got[("a", 1.0)]["survival"] == 0.5
    assert got[("a", 2.0)]["survival"] == 0.0
    # b's t=1 subject is censored: survival stays 1.0
    assert got[("b", 1.0)]["survival"] == 1.0
    assert got[("b", 2.0)]["survival"] == 0.0


def test_no_events_flat_curve(spark):
    got = _km(spark, [(1.0, 0), (5.0, 0)])
    assert all(r["survival"] == 1.0 for r in got.values())


def test_null_duration_excluded(spark):
    # ADVICE r7: a NULL duration must not form its own first-sorted
    # group skewing n_at_risk for everyone — same curve with/without it.
    clean = _km(spark, [(1.0, 1), (2.0, 1), (3.0, 0)])
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 0), (None, 1), (float("nan"), 0)],
        "duration double, event int",
    )
    got = {
        r["duration"]: r.asDict()
        for r in kaplan_meier(df, "duration", "event").collect()
    }
    assert set(got) == {1.0, 2.0, 3.0}
    assert got[1.0]["n_at_risk"] == 3 == clean[(1.0,)]["n_at_risk"]
    for t in (1.0, 2.0, 3.0):
        assert got[t]["survival"] == clean[(t,)]["survival"]
