"""Two-sample Kolmogorov–Smirnov drift test (operators/hyptest.py).

Hand-worked fixture (mandatory discipline), key "A":

  ref = [1, 2, 3], cur = [2, 3, 4] — grid {1, 2, 3, 4}
  cum_ref = 1, 2, 3, 3   F_ref = 1/3, 2/3, 1,   1
  cum_cur = 0, 1, 2, 3   F_cur = 0,   1/3, 2/3, 1
  |gap|   = 1/3, 1/3, 1/3, 0          ->  D = 1/3 = 0.333333
  d_crit  = sqrt(-ln(0.025)/2) * sqrt((3+3)/(3*3))
          = 1.3581015157... * 0.8164965809... = 1.108896...
  D < d_crit -> drifted = False.

Key "B" has only ref rows -> ks_stat / d_crit / drifted all NULL
(one-sided keys surface, they don't silently drop).

Key "C": 20x ref=1.0 vs 20x cur=2.0 — totally disjoint, D = 1.0,
d_crit = 1.3581... * sqrt(40/400) = 0.429465... -> drifted True.
"""

from __future__ import annotations

import math
import random

import pytest

from proyecto_final_de_big_data_spark.operators.hyptest import ks_two_sample

C_ALPHA = math.sqrt(-math.log(0.05 / 2.0) * 0.5)


def _frame(spark):
    rows = (
        [("A", "ref", float(x)) for x in (1, 2, 3)]
        + [("A", "cur", float(x)) for x in (2, 3, 4)]
        + [("B", "ref", 5.0), ("B", "ref", 6.0)]
        + [("C", "ref", 1.0)] * 20
        + [("C", "cur", 2.0)] * 20
        # ignored: unknown side label, NULL value, NULL key
        + [("A", "other", 9.0), ("A", "ref", None), (None, "cur", 1.0)]
    )
    return spark.createDataFrame(rows, "k string, side string, v double")


def test_hand_worked_fixture(spark):
    out = {
        r["k"]: r
        for r in ks_two_sample(
            _frame(spark), "v", "side", "ref", "cur", key_cols=["k"]
        ).collect()
    }
    assert set(out) == {"A", "B", "C"}

    a = out["A"]
    assert (a["n_ref"], a["n_cur"]) == (3, 3)
    assert a["ks_stat"] == round(1.0 / 3.0, 6)
    assert a["d_crit"] == round(C_ALPHA * math.sqrt(6.0 / 9.0), 6)
    assert a["drifted"] is False

    b = out["B"]
    assert (b["n_ref"], b["n_cur"]) == (2, 0)
    assert b["ks_stat"] is None and b["d_crit"] is None
    assert b["drifted"] is None

    c = out["C"]
    assert (c["n_ref"], c["n_cur"]) == (20, 20)
    assert c["ks_stat"] == 1.0
    assert c["d_crit"] == round(C_ALPHA * math.sqrt(40.0 / 400.0), 6)
    assert c["drifted"] is True


def test_global_no_keys(spark):
    df = _frame(spark).filter("k = 'A'")
    rows = ks_two_sample(df, "v", "side", "ref", "cur").collect()
    assert len(rows) == 1
    assert rows[0]["ks_stat"] == round(1.0 / 3.0, 6)


def test_python_brute_force_twin(spark):
    """Different-implementation twin: per-key D via a pure-Python
    double loop over the pooled sample (no grids, no cumsums)."""
    rng = random.Random(7)
    rows = [
        (
            rng.choice(["g1", "g2"]),
            rng.choice(["ref", "cur"]),
            round(rng.uniform(0, 20), 1),
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, side string, v double")
    got = {
        r["k"]: r
        for r in ks_two_sample(
            df, "v", "side", "ref", "cur", key_cols=["k"]
        ).collect()
    }
    for key in ("g1", "g2"):
        ref = sorted(v for k, s, v in rows if k == key and s == "ref")
        cur = sorted(v for k, s, v in rows if k == key and s == "cur")
        d = max(
            abs(
                sum(1 for r in ref if r <= x) / len(ref)
                - sum(1 for c in cur if c <= x) / len(cur)
            )
            for x in ref + cur
        )
        assert got[key]["ks_stat"] == round(d, 6)
        assert (got[key]["n_ref"], got[key]["n_cur"]) == (len(ref), len(cur))


def test_round_decimals_discretizes(spark):
    df = spark.createDataFrame(
        [("ref", 1.04), ("ref", 1.01), ("cur", 0.96), ("cur", 1.02)],
        "side string, v double",
    )
    rows = ks_two_sample(
        df, "v", "side", "ref", "cur", round_decimals=0
    ).collect()
    # everything rounds to 1.0 -> identical distributions, D = 0
    assert rows[0]["ks_stat"] == 0.0
    assert rows[0]["drifted"] is False


def test_grid_guard_raises(spark):
    df = spark.range(0, 5000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side",
        "CAST(id AS DOUBLE) / 7 AS v",
    )
    # the guard is in-plan (raise_error broadcast) since r11: it fires
    # at action time, before the per-key ECDF sort runs
    with pytest.raises(Exception, match="round_decimals"):
        ks_two_sample(df, "v", "side", "ref", "cur", max_distinct=100).collect()


def test_bad_params_raise(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="alpha"):
        ks_two_sample(df, "v", "side", "ref", "cur", alpha=1.5)
    with pytest.raises(ValueError, match="distinct side labels"):
        ks_two_sample(df, "v", "side", "ref", "ref")
