"""Nelson-Aalen cumulative hazard (operators/survival.py:nelson_aalen).

Hand-worked fixture (mandatory discipline), subjects
(duration, event): (1,1), (2,1), (2,0), (3,1), (4,0) — n = 5:

  t=1: d=1 n=5 -> H = 1/5  = 0.2     V = 1/25 = 0.04
  t=2: d=1 n=4 -> H = 0.45           V = 0.04 + 1/16  = 0.1025
  t=3: d=1 n=2 -> H = 0.95           V = 0.1025 + 1/4 = 0.3525
  t=4: d=0 n=1 -> H, V carry through (censoring adds 0 hazard)
  S_FH(3) = exp(-0.95) = 0.386741...
"""

from __future__ import annotations

import math
import random

import pytest

from proyecto_final_de_big_data_spark.operators.survival import (
    kaplan_meier,
    nelson_aalen,
)


def _subjects(spark):
    rows = [(1.0, 1), (2.0, 1), (2.0, 0), (3.0, 1), (4.0, 0),
            (None, 1)]  # NULL duration excluded up front
    return spark.createDataFrame(rows, "duration double, event int")


def test_hand_worked_fixture(spark):
    out = {r["duration"]: r for r in
           nelson_aalen(_subjects(spark), "duration", "event").collect()}
    assert set(out) == {1.0, 2.0, 3.0, 4.0}
    assert (out[1.0]["n_at_risk"], out[1.0]["cum_hazard"]) == (5, 0.2)
    assert out[1.0]["var_hazard"] == 0.04
    assert (out[2.0]["n_events"], out[2.0]["n_censored"]) == (1, 1)
    assert out[2.0]["cum_hazard"] == 0.45
    assert out[2.0]["var_hazard"] == 0.1025
    assert out[3.0]["cum_hazard"] == 0.95
    assert out[3.0]["var_hazard"] == 0.3525
    assert out[3.0]["survival_fh"] == round(math.exp(-0.95), 6)
    # censoring-only row carries the running values unchanged
    assert out[4.0]["cum_hazard"] == 0.95
    assert out[4.0]["n_at_risk"] == 1


def test_no_absorbing_zero_unlike_km(spark):
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1)], "duration double, event int"
    )
    na = {r["duration"]: r for r in
          nelson_aalen(df, "duration", "event").collect()}
    km = {r["duration"]: r for r in
          kaplan_meier(df, "duration", "event").collect()}
    # last event takes d == n: KM hits exactly 0, Fleming-Harrington
    # stays positive at exp(-(1/2 + 1/1)).
    assert km[2.0]["survival"] == 0.0
    assert na[2.0]["cum_hazard"] == 1.5
    assert na[2.0]["survival_fh"] == round(math.exp(-1.5), 6)


def test_grouped_by_key(spark):
    rows = [("a", 1.0, 1), ("a", 2.0, 0), ("b", 1.0, 1), ("b", 1.0, 1)]
    df = spark.createDataFrame(rows, "g string, duration double, event int")
    out = nelson_aalen(df, "duration", "event", by=["g"]).collect()
    a = {r["duration"]: r for r in out if r["g"] == "a"}
    b = {r["duration"]: r for r in out if r["g"] == "b"}
    assert a[1.0]["cum_hazard"] == 0.5
    assert a[2.0]["cum_hazard"] == 0.5
    assert b[1.0]["cum_hazard"] == 1.0  # d=2, n=2
    assert b[1.0]["var_hazard"] == 0.5


def test_python_twin_random_and_fh_tracks_km(spark):
    rng = random.Random(37)
    rows = [(float(rng.randint(1, 15)), rng.randint(0, 1))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "duration double, event int")
    got = {r["duration"]: r for r in
           nelson_aalen(df, "duration", "event").collect()}
    km = {r["duration"]: r for r in
          kaplan_meier(df, "duration", "event").collect()}

    grid = sorted({d for d, _ in rows})
    h = v = 0.0
    for t in grid:
        n_risk = sum(1 for d, _ in rows if d >= t)
        d_t = sum(1 for d, e in rows if d == t and e == 1)
        if d_t > 0:
            h += d_t / n_risk
            v += d_t / n_risk**2
        assert got[t]["n_at_risk"] == n_risk
        assert got[t]["cum_hazard"] == pytest.approx(round(h, 6), abs=2e-6)
        assert got[t]["var_hazard"] == pytest.approx(round(v, 6), abs=2e-6)
        # Fleming-Harrington upper-bounds KM and stays close
        if km[t]["survival"] > 0:
            assert got[t]["survival_fh"] >= km[t]["survival"] - 1e-6
            assert got[t]["survival_fh"] - km[t]["survival"] < 0.05
