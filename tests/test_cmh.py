"""Cochran-Mantel-Haenszel stratified test (operators/abtest.py).

Hand-worked fixtures (mandatory discipline), exact fractions:

  NULL case (perfectly crossed strata):
    S1 a=8 b=2 c=3 d=7 (n=20): ad/n=2.8, bc/n=0.3, E=5.5, dev=2.5,
       Var = 10*10*11*9/(400*19) = 9900/7600
    S2 a=2 b=8 c=7 d=3:        ad/n=0.3, bc/n=2.8, E=4.5, dev=-2.5
    -> sum dev = 0 -> chi2 = 0; OR = 3.1/3.1 = 1.0

  EFFECT case:
    S1 a=9 b=1 c=5 d=5: ad/n=2.25, bc/n=0.25, dev=2, Var=8400/7600
    S2 a=6 b=4 c=2 d=8: ad/n=2.40, bc/n=0.40, dev=2, Var=9600/7600
    -> chi2 = 16 / (18000/7600) = 6.755556 (6dp), OR = 4.65/0.65
"""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.abtest import cmh_test


def _units(spark, strata):
    # strata: dict stratum -> (a, b, c, d)
    rows = []
    for st, (a, b, c, d) in strata.items():
        rows += [(st, "t", 1)] * a + [(st, "t", 0)] * b
        rows += [(st, "c", 1)] * c + [(st, "c", 0)] * d
    return spark.createDataFrame(rows, "stratum string, arm string, conv int")


def test_cmh_null_case_exact(spark):
    u = _units(spark, {"s1": (8, 2, 3, 7), "s2": (2, 8, 7, 3)})
    r = cmh_test(u, "stratum", "arm", "conv", "c", "t").collect()[0]
    assert (r["n_strata"], r["n_units"]) == (2, 40)
    assert r["or_cmh"] == 1.0
    assert r["chi2_cmh"] == 0.0
    assert r["significant"] is False


def test_cmh_effect_case_exact(spark):
    u = _units(spark, {"s1": (9, 1, 5, 5), "s2": (6, 4, 2, 8)})
    r = cmh_test(u, "stratum", "arm", "conv", "c", "t").collect()[0]
    assert r["or_cmh"] == round(4.65 / 0.65, 6)
    assert r["chi2_cmh"] == round(16 / (18000 / 7600), 6)
    assert r["significant"] is True  # 6.76 > 3.84


def test_cmh_simpson_paradox_guard(spark):
    # Marginal table shows treatment WORSE (pooled conv 30/60 vs
    # 36/60) because treatment is over-allocated to the hard stratum;
    # within each stratum treatment is strictly better. CMH must side
    # with the strata (OR > 1), the pooled 2x2 would not.
    u = _units(
        spark,
        {
            "easy": (9, 1, 28, 12),   # treat 90% vs ctrl 70%
            "hard": (21, 29, 8, 12),  # treat 42% vs ctrl 40%
        },
    )
    r = cmh_test(u, "stratum", "arm", "conv", "c", "t").collect()[0]
    assert r["or_cmh"] > 1.0


def test_cmh_degenerate_and_validation(spark):
    # Every stratum has a zero margin -> sums vanish -> NULL readouts.
    u = _units(spark, {"s1": (5, 0, 5, 0)})  # everyone converts
    r = cmh_test(u, "stratum", "arm", "conv", "c", "t").collect()[0]
    assert r["chi2_cmh"] is None and r["significant"] is None
    assert r["or_cmh"] is None  # no discordant bc mass
    with pytest.raises(ValueError, match="control == treatment"):
        cmh_test(u, "stratum", "arm", "conv", "t", "t")
    # Off-design arms are ignored entirely.
    extra = u.union(
        u.sparkSession.createDataFrame(
            [("s1", "zz", 1)], "stratum string, arm string, conv int"
        )
    )
    r2 = cmh_test(extra, "stratum", "arm", "conv", "c", "t").collect()[0]
    assert r2["n_units"] == 10


def test_cmh_nonzero_truthy_and_null_flag_exclusion(spark):
    # Success is any NONZERO int (a conv count of 2 is a success, not
    # a failure); NULL flags are excluded from the cells entirely.
    rows = [
        ("s1", "t", 2), ("s1", "t", 0), ("s1", "c", 1), ("s1", "c", 0),
        ("s1", "t", None),
    ]
    u = spark.createDataFrame(rows, "stratum string, arm string, conv int")
    r = cmh_test(u, "stratum", "arm", "conv", "c", "t").collect()[0]
    assert r["n_units"] == 4  # the NULL-flag unit is excluded
    # cells: a=1 b=1 c=1 d=1 -> dev = 1 - 2*2/4 = 0 -> chi2 = 0.
    assert r["chi2_cmh"] == 0.0
