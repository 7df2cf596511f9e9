"""Unit tests for operators/anonymity.py."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.anonymity import (
    k_anonymity_profile,
    suppress_small_classes,
)


def _people(spark, rows):
    return spark.createDataFrame(rows, "zip string, yob int, name string")


ROWS = [
    ("10001", 1980, "a"), ("10001", 1980, "b"), ("10001", 1980, "c"),
    ("10002", 1990, "d"), ("10002", 1990, "e"),
    ("10003", 1975, "f"),  # singleton -> re-identifiable
]


def test_profile_hand_checked(spark):
    out = k_anonymity_profile(
        _people(spark, ROWS), ["zip", "yob"], k=3
    ).first()
    assert out["n_rows"] == 6 and out["n_classes"] == 3
    assert out["min_class_size"] == 1
    assert out["n_rows_at_risk"] == 3  # the 2-class and the singleton
    assert out["at_risk_frac"] == 0.5
    assert out["is_k_anonymous"] is False


def test_profile_k_anonymous_dataset(spark):
    rows = [("z", 1980, str(i)) for i in range(4)]
    out = k_anonymity_profile(_people(spark, rows), ["zip", "yob"], k=3).first()
    assert out["is_k_anonymous"] is True and out["n_rows_at_risk"] == 0


def test_nulls_are_their_own_class(spark):
    rows = [(None, 1980, "a"), (None, 1980, "b"), ("z", 1980, "c")]
    out = k_anonymity_profile(_people(spark, rows), ["zip", "yob"], k=2).first()
    assert out["n_classes"] == 2 and out["n_rows_at_risk"] == 1


def test_suppression_drops_only_small_classes(spark):
    kept = suppress_small_classes(_people(spark, ROWS), ["zip", "yob"], k=2)
    names = {r["name"] for r in kept.collect()}
    assert names == {"a", "b", "c", "d", "e"}  # singleton f suppressed
    # post-suppression the dataset IS k-anonymous at k=2
    prof = k_anonymity_profile(kept, ["zip", "yob"], k=2).first()
    assert prof["is_k_anonymous"] is True


def test_suppression_preserves_null_classes(spark):
    rows = [(None, 1980, "a"), (None, 1980, "b"), ("z", 1999, "c")]
    kept = suppress_small_classes(_people(spark, rows), ["zip", "yob"], k=2)
    assert {r["name"] for r in kept.collect()} == {"a", "b"}


def test_validations(spark):
    df = _people(spark, ROWS)
    with pytest.raises(ValueError):
        k_anonymity_profile(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity_profile(df, ["zip"], k=1)
    with pytest.raises(ValueError):
        suppress_small_classes(df, ["zip"], k=0)


def test_empty_input_is_vacuously_k_anonymous(spark):
    df = spark.createDataFrame([], "zip string, yob int, name string")
    out = k_anonymity_profile(df, ["zip", "yob"], k=3).first()
    assert out["n_rows"] == 0 and out["n_rows_at_risk"] == 0
    assert out["is_k_anonymous"] is True
    assert out["min_class_size"] is None
