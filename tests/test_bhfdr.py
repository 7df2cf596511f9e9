"""Benjamini-Hochberg FDR correction (operators/hyptest.py:bh_fdr).

Hand-worked fixture (the mandatory hand-fixture discipline):
p = [0.005, 0.01, 0.03, 0.04], m = 4, alpha = 0.05:

    rank  p      p*m/rank   reverse-min (q)   i*alpha/m   step-up
    1     0.005  0.02       0.02              0.0125      reject
    2     0.01   0.02       0.02              0.025       reject
    3     0.03   0.04       0.04              0.0375      reject
    4     0.04   0.04       0.04              0.05        reject

And with p4 = 0.2 instead: raws [0.02, 0.02, 0.04, 0.2],
q = [0.02, 0.02, 0.04, 0.2] -> only the first three reject.
"""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.hyptest import bh_fdr


def _df(spark, ps):
    return spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "test_id string, p double"
    )


def test_hand_worked_all_reject(spark):
    out = {
        r["test_id"]: r
        for r in bh_fdr(
            _df(spark, [0.01, 0.04, 0.03, 0.005]), "p", ["test_id"]
        ).collect()
    }
    assert out["t3"]["rank"] == 1 and out["t3"]["q_value"] == 0.02
    assert out["t0"]["q_value"] == 0.02
    assert out["t2"]["q_value"] == 0.04
    assert out["t1"]["q_value"] == 0.04
    assert all(r["reject"] for r in out.values())
    assert all(r["m"] == 4 for r in out.values())


def test_hand_worked_partial_reject(spark):
    out = {
        r["test_id"]: r
        for r in bh_fdr(
            _df(spark, [0.01, 0.2, 0.03, 0.005]), "p", ["test_id"]
        ).collect()
    }
    assert [out[f"t{i}"]["reject"] for i in range(4)] == [True, False, True, True]
    assert out["t1"]["q_value"] == 0.2


def test_q_monotone_and_clipped(spark):
    # Classic property: q is nondecreasing in p-rank and never above 1.
    ps = [0.9, 0.99, 0.5, 0.04, 0.2, 0.7]
    rows = sorted(
        bh_fdr(_df(spark, ps), "p", ["test_id"]).collect(),
        key=lambda r: r["rank"],
    )
    qs = [r["q_value"] for r in rows]
    assert qs == sorted(qs)
    assert max(qs) <= 1.0


def test_ties_break_deterministically(spark):
    ps = [0.03, 0.03, 0.03]
    rows = sorted(
        bh_fdr(_df(spark, ps), "p", ["test_id"]).collect(),
        key=lambda r: r["rank"],
    )
    # key ascending within the tie: t0, t1, t2.
    assert [r["test_id"] for r in rows] == ["t0", "t1", "t2"]
    # Tied p-values share one q: p*m/rank is largest at rank 1 but the
    # reverse running min pulls all three to p*3/3 = 0.03.
    assert {r["q_value"] for r in rows} == {0.03}


def test_invalid_p_hard_fails(spark):
    for bad in ([0.01, None], [0.01, 1.5], [0.01, float("nan")]):
        with pytest.raises(Exception, match="bh_fdr"):
            bh_fdr(_df(spark, bad), "p", ["test_id"]).collect()
    with pytest.raises(ValueError, match="alpha"):
        bh_fdr(_df(spark, [0.1]), "p", ["test_id"], alpha=1.0)
    with pytest.raises(ValueError, match="key columns"):
        bh_fdr(_df(spark, [0.1]), "p", [])
