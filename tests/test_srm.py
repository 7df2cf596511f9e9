"""Sample-ratio-mismatch check (operators/abtest.py:srm_check).

Hand-computed fixtures (mandatory discipline), exact chi-square values:

  A) obs a=40, b=60 vs expected 0.5/0.5 (N=100, E=50 each):
     chi2 = 100/50 + 100/50 = 4.0 -> below the df=1 alert bar, no SRM.
  B) same counts vs expected 0.8/0.2 (E=80/20):
     chi2 = 1600/80 + 1600/20 = 20 + 80 = 100.0 -> SRM.
  C) expected arm 'c' absent (expected 0.5/0.25/0.25, obs a=40 b=60):
     E = 50/25/25; chi2 = 100/50 + 1225/25 + 625/25 = 2 + 49 + 25 = 76.
"""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.abtest import (
    chi2_critical_approx,
    srm_check,
)


def _units(spark, counts):
    rows = [(f"u{arm}{i}", arm) for arm, n in counts.items() for i in range(n)]
    return spark.createDataFrame(rows, "unit string, arm string")


def test_srm_hand_worked_balanced_and_skewed(spark):
    u = _units(spark, {"a": 40, "b": 60})
    ok = srm_check(u, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    assert (ok["n_arms"], ok["n_total"], ok["n_unexpected_units"]) == (2, 100, 0)
    assert ok["chi2"] == 4.0
    assert ok["srm_suspected"] is False
    bad = srm_check(u, "arm", {"a": 0.8, "b": 0.2}).collect()[0]
    assert bad["chi2"] == 100.0
    assert bad["srm_suspected"] is True


def test_srm_missing_arm_contributes_full_expected(spark):
    u = _units(spark, {"a": 40, "b": 60})
    row = srm_check(u, "arm", {"a": 0.5, "b": 0.25, "c": 0.25}).collect()[0]
    assert row["n_arms"] == 3 and row["n_total"] == 100
    assert row["chi2"] == 76.0
    assert row["srm_suspected"] is True


def test_srm_unexpected_units_counted_not_scored(spark):
    u = _units(spark, {"a": 50, "b": 50, "zz": 7})
    row = srm_check(u, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    assert row["n_unexpected_units"] == 7
    assert row["n_total"] == 100  # zz excluded from N and chi2
    assert row["chi2"] == 0.0


def test_srm_validation_and_critical_values(spark):
    u = _units(spark, {"a": 10, "b": 10})
    with pytest.raises(ValueError, match="at least 2"):
        srm_check(u, "arm", {"a": 1.0})
    with pytest.raises(ValueError, match="sum to 1"):
        srm_check(u, "arm", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        srm_check(u, "arm", {"a": 1.2, "b": -0.2})
    with pytest.raises(ValueError, match="df"):
        chi2_critical_approx(0)
    # Wilson-Hilferty sanity vs exact table values (alpha = 0.001):
    # df=1 exact 10.828, df=3 exact 16.266, df=9 exact 27.877.
    assert chi2_critical_approx(1) == pytest.approx(10.828, rel=0.05)
    assert chi2_critical_approx(3) == pytest.approx(16.266, rel=0.02)
    assert chi2_critical_approx(9) == pytest.approx(27.877, rel=0.01)
    # Caller-supplied exact critical overrides the approximation.
    row = srm_check(
        u, "arm", {"a": 0.5, "b": 0.5}, chi2_crit=10.828
    ).collect()[0]
    assert row["chi2_crit"] == 10.828
