"""Unit tests for ml/evaluation.py — hand-checkable fixtures first,
then invariants the bucketing must preserve."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.ml.evaluation import (
    classification_report,
    lift_table,
    roc_auc,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "s double, y boolean")


def test_auc_perfect_classifier(spark):
    rows = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    out = roc_auc(_scored(spark, rows), "s", "y", lo=0.0, hi=1.0).first()
    assert out["auc"] == 1.0
    assert (out["n"], out["n_pos"], out["n_neg"]) == (4, 2, 2)


def test_auc_inverted_classifier(spark):
    rows = [(0.1, True), (0.2, True), (0.8, False), (0.9, False)]
    out = roc_auc(_scored(spark, rows), "s", "y", lo=0.0, hi=1.0).first()
    assert out["auc"] == 0.0


def test_auc_all_tied_is_half(spark):
    # Every score in one bucket -> the single half-credit rectangle.
    rows = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
    out = roc_auc(_scored(spark, rows), "s", "y", lo=0.0, hi=1.0).first()
    assert out["auc"] == 0.5


def test_auc_matches_rank_formula_when_buckets_separate(spark):
    # Distinct scores, enough buckets that each lands alone: the
    # trapezoid equals the exact Mann-Whitney AUC.
    rows = [
        (0.95, True), (0.85, False), (0.75, True), (0.65, True),
        (0.55, False), (0.45, True), (0.35, False), (0.25, False),
    ]
    # pairs: pos scores {.95,.75,.65,.45}, neg {.85,.55,.35,.25}
    # wins: .95 beats all 4; .75 beats 3; .65 beats 3; .45 beats 2 = 12/16
    out = roc_auc(_scored(spark, rows), "s", "y", lo=0.0, hi=1.0).first()
    assert out["auc"] == pytest.approx(12 / 16)


def test_auc_single_class_is_null(spark):
    rows = [(0.9, True), (0.1, True)]
    out = roc_auc(_scored(spark, rows), "s", "y", lo=0.0, hi=1.0).first()
    assert out["auc"] is None


def test_auc_out_of_range_scores_clamp(spark):
    rows = [(5.0, True), (-5.0, False)]
    out = roc_auc(_scored(spark, rows), "s", "y", lo=0.0, hi=1.0).first()
    assert out["auc"] == 1.0


def test_classification_report_hand_checked(spark):
    rows = [(0.9, True), (0.6, False), (0.4, True), (0.1, False)]
    out = {
        r["threshold"]: r
        for r in classification_report(
            _scored(spark, rows), "s", "y", thresholds=[0.5, 0.95]
        ).collect()
    }
    r = out[0.5]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (1, 1, 1, 1)
    assert r["accuracy"] == 0.5
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["f1"] == 0.5
    hi = out[0.95]  # nothing predicted positive
    assert (hi["tp"], hi["fp"]) == (0, 0)
    assert hi["precision"] is None  # degenerate, not 0.0
    assert hi["recall"] == 0.0


def test_classification_report_empty_thresholds_raises(spark):
    with pytest.raises(ValueError):
        classification_report(_scored(spark, [(0.5, True)]), "s", "y", [])


def test_lift_table_top_bin_concentration(spark):
    # 20 rows, positives all in the top-scoring quarter.
    rows = [(i / 20.0, i >= 15) for i in range(20)]
    out = {r["bin"]: r for r in lift_table(
        _scored(spark, rows), "s", "y", n_bins=4
    ).collect()}
    assert sum(r["n"] for r in out.values()) == 20
    assert out[3]["n_pos"] == 5 and out[3]["cum_capture"] == 1.0
    assert out[3]["lift"] == pytest.approx(1.0 / 0.25)
    assert out[0]["n_pos"] == 0 and out[0]["lift"] == 0.0
    # cum_capture is monotone from the top bin down
    caps = [out[b]["cum_capture"] for b in sorted(out, reverse=True)]
    assert caps == sorted(caps)


def test_lift_table_no_positives_null_lift(spark):
    rows = [(i / 10.0, False) for i in range(10)]
    out = lift_table(_scored(spark, rows), "s", "y", n_bins=2).collect()
    assert all(r["lift"] is None and r["cum_capture"] is None for r in out)


def test_auc_validates_bounds(spark):
    with pytest.raises(ValueError):
        roc_auc(_scored(spark, [(0.5, True)]), "s", "y", lo=1.0, hi=1.0)


def test_auc_null_and_nan_scores_excluded(spark):
    rows = [(0.9, True), (0.1, False), (None, True), (float("nan"), False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = roc_auc(df, "s", "y", lo=0.0, hi=1.0).first()
    assert out["n"] == 2 and out["auc"] == 1.0


def test_classification_report_excludes_null_rows(spark):
    rows = [(0.9, True), (0.1, False), (None, True), (0.8, None)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = classification_report(df, "s", "y", thresholds=[0.5]).first()
    # n counts only fully-scored, labeled rows — tn/accuracy not inflated
    assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == 2
    assert r["accuracy"] == 1.0


def test_brier_and_ece_hand_checked(spark):
    from proyecto_final_de_big_data_spark.ml.evaluation import brier_and_ece

    rows = [(0.8, True), (0.8, False), (0.2, False), (0.2, False)]
    out = brier_and_ece(_scored(spark, rows), "s", "y", n_buckets=10).first()
    # brier = (0.04 + 0.64 + 0.04 + 0.04)/4 = 0.19
    assert out["brier"] == pytest.approx(0.19)
    # bucket .8: |1.6-1|/4 ; bucket .2: |0.4-0|/4 -> (0.6+0.4)/4 = 0.25
    assert out["ece"] == pytest.approx(0.25)
    assert out["n"] == 4


def test_brier_perfect_probabilities(spark):
    from proyecto_final_de_big_data_spark.ml.evaluation import brier_and_ece

    rows = [(1.0, True), (0.0, False)] * 5
    out = brier_and_ece(_scored(spark, rows), "s", "y").first()
    assert out["brier"] == 0.0 and out["ece"] == 0.0


def test_brier_excludes_nulls(spark):
    from proyecto_final_de_big_data_spark.ml.evaluation import brier_and_ece

    df = spark.createDataFrame(
        [(0.5, True), (None, True), (float("nan"), False)],
        "s double, y boolean",
    )
    assert brier_and_ece(df, "s", "y").first()["n"] == 1


def test_brier_out_of_range_probability_raises(spark):
    # ADVICE r7: raw margins passed as probabilities must hard-fail,
    # not clamp into edge buckets and emit plausible-looking numbers.
    from proyecto_final_de_big_data_spark.ml.evaluation import brier_and_ece

    df = spark.createDataFrame(
        [(0.5, True), (1.7, False)], "s double, y boolean"
    )
    with pytest.raises(Exception, match="outside \\[0, 1\\]"):
        brier_and_ece(df, "s", "y").collect()
    df2 = spark.createDataFrame(
        [(0.5, True), (-0.2, False)], "s double, y boolean"
    )
    with pytest.raises(Exception, match="outside \\[0, 1\\]"):
        brier_and_ece(df2, "s", "y").collect()
