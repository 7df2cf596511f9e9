"""mSPRT always-valid monitoring (operators/abtest.py:msprt_monitor).

Hand-worked mixture likelihood ratio (the mandatory hand-fixture
discipline): with tau = 1 and a day whose cumulative state is
delta = 3, V = 1,

    Lambda = sqrt(1/2) * exp(9 / (2*1*2)) = sqrt(0.5) * e^2.25
           = 0.7071068 * 9.4877358 = 6.7088609
    p = min(1, 1/Lambda) = 0.1490565

The fixture below constructs exactly that state on day 2: each arm has
cumulative values with sample variance 2 and n = 4, so
V = 2/4 + 2/4 = 1, and the means differ by 3.
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.abtest import msprt_monitor

# Each arm's cumulative values after day 2 are [m-2, m+1, m, m+1]:
# mean m, squared deviations 4+1+0+1 = 6, sample variance 6/3 = 2, so
# V = 2/4 + 2/4 = 1 exactly; the arm means differ by 3.
CONTROL = [8.0, 11.0, 10.0, 11.0]   # mean 10, sample var 2
TREAT = [11.0, 14.0, 13.0, 14.0]    # mean 13, sample var 2


def _units(spark):
    rows = (
        [(1, "c", v) for v in CONTROL[:2]]
        + [(1, "t", v) for v in TREAT[:2]]
        + [(2, "c", v) for v in CONTROL[2:]]
        + [(2, "t", v) for v in TREAT[2:]]
    )
    return spark.createDataFrame(rows, "day long, g string, y double")


def test_hand_worked_lambda_and_p(spark):
    out = {
        r["day"]: r
        for r in msprt_monitor(
            _units(spark), "day", "g", "y", "c", "t", tau=1.0
        ).collect()
    }
    d2 = out[2]
    assert (d2["n_control"], d2["n_treatment"]) == (4, 4)
    assert (d2["mean_control"], d2["mean_treatment"]) == (10.0, 13.0)
    assert d2["delta"] == 3.0
    assert d2["variance"] == 1.0
    lam = math.sqrt(0.5) * math.exp(9.0 / 4.0)
    assert d2["lambda"] == round(lam, 6)
    # Day-1 lambda is smaller (delta 3, V = 2.25+2.25... n=2 per arm,
    # var_c = 4.5? control [8,11] var 4.5, treat [11,14] var 4.5 ->
    # V = 4.5), so the running max on day 2 IS day 2's lambda.
    assert d2["p_always_valid"] == round(min(1.0, 1.0 / lam), 6)
    assert d2["significant"] == 0  # p ~0.149 > 0.05


def test_p_is_monotone_nonincreasing(spark):
    # Strong persistent effect: p must never increase day over day.
    rows = []
    for day in range(1, 8):
        for j in range(10):
            rows.append((day, "c", 10.0 + (j % 3)))
            rows.append((day, "t", 14.0 + (j % 3)))
    df = spark.createDataFrame(rows, "day long, g string, y double")
    out = sorted(
        msprt_monitor(df, "day", "g", "y", "c", "t", tau=1.0).collect(),
        key=lambda r: r["day"],
    )
    ps = [r["p_always_valid"] for r in out]
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    assert out[-1]["significant"] == 1


def test_warmup_days_carry_null(spark):
    rows = [(1, "c", 10.0), (1, "t", 12.0), (2, "c", 11.0), (2, "t", 13.0)]
    df = spark.createDataFrame(rows, "day long, g string, y double")
    out = {r["day"]: r for r in msprt_monitor(df, "day", "g", "y", "c", "t").collect()}
    assert out[1]["lambda"] is None and out[1]["p_always_valid"] is None
    assert out[1]["significant"] is None
    assert out[2]["lambda"] is not None  # both arms reach n=2


def test_no_effect_stays_insignificant(spark):
    rows = []
    for day in range(1, 6):
        for j in range(6):
            rows.append((day, "c", 10.0 + (j % 4)))
            rows.append((day, "t", 10.0 + ((j + 2) % 4)))
    df = spark.createDataFrame(rows, "day long, g string, y double")
    out = msprt_monitor(df, "day", "g", "y", "c", "t", tau=1.0).collect()
    assert all(r["significant"] in (0, None) for r in out)


def test_validation(spark):
    df = _units(spark)
    with pytest.raises(ValueError, match="tau"):
        msprt_monitor(df, "day", "g", "y", "c", "t", tau=0.0)
    with pytest.raises(ValueError, match="alpha"):
        msprt_monitor(df, "day", "g", "y", "c", "t", alpha=1.0)
    with pytest.raises(ValueError, match="control == treatment"):
        msprt_monitor(df, "day", "g", "y", "c", "c")
