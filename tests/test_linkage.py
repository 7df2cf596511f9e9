"""Fellegi-Sunter scoring (operators/linkage.py).

Hand-worked weights (the mandatory hand-fixture discipline) with
m = (0.9, 0.95) and u pinned to (0.1, 0.05) via an explicit one-row
frame:

    name  agree  w  = log2(0.9/0.1)   = log2(9)  =  3.169925
    name  differ w' = log2(0.1/0.9)   = -log2(9) = -3.169925
    dob   agree  w  = log2(0.95/0.05) = log2(19) =  4.247928
    dob   differ w' = log2(0.05/0.95) = -log2(19)= -4.247928

    both agree:            3.169925 + 4.247928 =  7.417853 -> match
    name only (dob diff):  3.169925 - 4.247928 = -1.078003 -> possible
    dob missing:           3.169925 + 0        =  3.169925 -> possible
    both differ:                               = -7.417853 -> non_match

(thresholds upper=6, lower=-6)
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.linkage import (
    estimate_u_probabilities,
    fellegi_sunter_scores,
)


def _u(spark, vals):
    return spark.createDataFrame(
        [tuple(vals)], ", ".join(f"u_{i} double" for i in range(len(vals)))
    )


def _pairs(spark):
    rows = [
        ("p1", "ann", "ann", "1990", "1990"),
        ("p2", "ann", "ann", "1990", "1991"),
        ("p3", "ann", "ann", None, "1990"),
        ("p4", "ann", "bob", "1990", "1991"),
    ]
    return spark.createDataFrame(
        rows, "pid string, l_name string, r_name string, l_dob string, r_dob string"
    )


def test_hand_worked_weights_and_classes(spark):
    out = fellegi_sunter_scores(
        _pairs(spark),
        [("l_name", "r_name"), ("l_dob", "r_dob")],
        m=[0.9, 0.95],
        u=_u(spark, [0.1, 0.05]),
        upper=6.0,
        lower=-6.0,
    )
    got = {r["pid"]: r for r in out.collect()}
    w1, w2 = math.log2(9), math.log2(19)
    assert got["p1"]["score"] == round(w1 + w2, 6)
    assert got["p1"]["match_class"] == "match"
    assert got["p2"]["score"] == round(w1 - w2, 6)
    assert got["p2"]["match_class"] == "possible"
    assert got["p3"]["score"] == round(w1, 6)
    assert got["p3"]["gamma_1"] is None
    assert got["p3"]["match_class"] == "possible"
    assert got["p4"]["score"] == round(-w1 - w2, 6)
    assert got["p4"]["match_class"] == "non_match"
    assert (got["p1"]["gamma_0"], got["p2"]["gamma_1"]) == (1, 0)


def test_u_estimate_is_sum_squared_frequencies(spark):
    # field values: a,a,a,b (N=4): u = (9+1)/16 = 0.625.
    # second field has a NULL: values x,x,y (N=3): u = (4+1)/9.
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", None)],
        "f1 string, f2 string",
    )
    row = estimate_u_probabilities(df, ["f1", "f2"]).collect()[0]
    assert row["u_0"] == 0.625
    assert row["u_1"] == 5 / 9


def test_validation(spark):
    pairs = _pairs(spark)
    u = _u(spark, [0.1, 0.05])
    with pytest.raises(ValueError, match="m-probabilities"):
        fellegi_sunter_scores(pairs, [("l_name", "r_name")], [0.9, 0.95], u, 6, -6)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        fellegi_sunter_scores(
            pairs, [("l_name", "r_name"), ("l_dob", "r_dob")], [0.9, 1.0], u, 6, -6
        )
    with pytest.raises(ValueError, match="upper"):
        fellegi_sunter_scores(
            pairs, [("l_name", "r_name"), ("l_dob", "r_dob")], [0.9, 0.95], u, -6, 6
        )
    with pytest.raises(ValueError, match="at least one comparison"):
        fellegi_sunter_scores(pairs, [], [], u, 6, -6)
    with pytest.raises(ValueError, match="field columns"):
        estimate_u_probabilities(pairs, [])


def test_degenerate_u_raises_friendly_error(spark):
    # A constant comparison field estimates u = 1, which makes the
    # disagreement weight log2((1-m)/(1-u)) divide by zero — the
    # operator must raise the friendly guard, not a raw ANSI
    # DIVIDE_BY_ZERO mid-job (ADVICE r9; the cuped constant-covariate
    # posture).
    pairs = _pairs(spark)
    comps = [("l_name", "r_name"), ("l_dob", "r_dob")]
    with pytest.raises(ValueError, match="u_1 .* outside \\(0, 1\\)"):
        fellegi_sunter_scores(
            pairs, comps, [0.9, 0.95], _u(spark, [0.1, 1.0]), 6, -6
        )
    with pytest.raises(ValueError, match="u_0 .* outside \\(0, 1\\)"):
        fellegi_sunter_scores(
            pairs, comps, [0.9, 0.95], _u(spark, [0.0, 0.05]), 6, -6
        )
    with pytest.raises(ValueError, match="exactly 1 row"):
        fellegi_sunter_scores(
            pairs,
            comps,
            [0.9, 0.95],
            _u(spark, [0.1, 0.05]).union(_u(spark, [0.1, 0.05])),
            6,
            -6,
        )


def test_score_is_monotone_in_agreements(spark):
    # More agreeing fields can only raise the score (fixed m > u).
    out = fellegi_sunter_scores(
        _pairs(spark),
        [("l_name", "r_name"), ("l_dob", "r_dob")],
        m=[0.9, 0.95],
        u=_u(spark, [0.1, 0.05]),
        upper=6.0,
        lower=-6.0,
    )
    got = {r["pid"]: r["score"] for r in out.collect()}
    assert got["p1"] > got["p3"] > got["p2"] > got["p4"]


def test_blocking_profile_hand_worked(spark):
    # Hand-worked: blocks A=4, B=3, C=1 records, plus two NULL-key rows
    # (excluded and counted). candidate_pairs = C(4,2)+C(3,2)+C(1,2)
    # = 6+3+0 = 9; N=8 kept, all-pairs C(8,2)=28 -> reduction_ratio
    # = 1 - 9/28 = 0.678571; cap=3 -> only block A is over.
    from proyecto_final_de_big_data_spark.operators.linkage import (
        blocking_profile,
    )

    rows = (
        [("A", i) for i in range(4)]
        + [("B", i) for i in range(3)]
        + [("C", 0)]
        + [(None, 0), (None, 1)]
    )
    df = spark.createDataFrame(rows, "blk string, payload long")
    r = blocking_profile(df, ["blk"], max_block=3).collect()[0]
    assert (r["n_records"], r["n_null_key"], r["n_blocks"]) == (8, 2, 3)
    assert (r["max_block_size"], r["p99_block_size"]) == (4, 4)
    assert r["candidate_pairs"] == 9
    assert r["reduction_ratio"] == round(1 - 9 / 28, 6)
    assert r["n_over_cap"] == 1


def test_blocking_profile_degenerate_and_validation(spark):
    from proyecto_final_de_big_data_spark.operators.linkage import (
        blocking_profile,
    )

    import pytest as _pytest

    # One kept record: all-pairs undefined -> NULL ratio, zero pairs.
    df = spark.createDataFrame(
        [("A", 1), (None, 2)], "blk string, payload long"
    )
    r = blocking_profile(df, ["blk"]).collect()[0]
    assert (r["n_records"], r["candidate_pairs"]) == (1, 0)
    assert r["reduction_ratio"] is None
    with _pytest.raises(ValueError, match="block column"):
        blocking_profile(df, [])
    with _pytest.raises(ValueError, match="max_block"):
        blocking_profile(df, ["blk"], max_block=0)
