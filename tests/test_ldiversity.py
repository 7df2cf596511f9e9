"""l-diversity profile (operators/anonymity.py:l_diversity_profile).

Hand-worked fixture (the mandatory hand-fixture discipline), after the
Machanavajjhala et al. inpatient example shape — three quasi classes
with deliberately different diversity:

    class  sensitive values   n  distinct  entropy −Σ p·ln p
    A      flu, flu, cold     3  2         ln3 − (2ln2)/3 = 0.6365142
    B      hiv, hiv           2  1         0            (pure class)
    C      flu, cold, hiv     3  3         ln3          = 1.0986123

At l=2: min distinct = 1 (class B violates), 1 class / 2 rows at risk,
at_risk_frac = 2/8 = 0.25, NOT l-diverse; min_entropy = 0 so
entropy_l = 1.
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.anonymity import (
    l_diversity_profile,
)

ROWS = [
    ("A", "flu"),
    ("A", "flu"),
    ("A", "cold"),
    ("B", "hiv"),
    ("B", "hiv"),
    ("C", "flu"),
    ("C", "cold"),
    ("C", "hiv"),
]


def test_hand_worked_fixture(spark):
    df = spark.createDataFrame(ROWS, "zip string, disease string")
    row = l_diversity_profile(df, ["zip"], "disease", l=2).collect()[0]
    assert row["n_rows"] == 8 and row["n_classes"] == 3
    assert row["min_distinct_sensitive"] == 1
    assert row["n_classes_below"] == 1
    assert row["n_rows_at_risk"] == 2
    assert row["at_risk_frac"] == 0.25
    assert row["is_l_diverse"] is False
    assert row["min_entropy"] == 0.0
    assert row["entropy_l"] == 1.0


def test_entropy_values_match_hand_computation(spark):
    # Drop class B: min entropy is class A's ln3 − (2·ln2)/3.
    df = spark.createDataFrame(
        [r for r in ROWS if r[0] != "B"], "zip string, disease string"
    )
    row = l_diversity_profile(df, ["zip"], "disease", l=2).collect()[0]
    h_a = math.log(3) - (2 * math.log(2)) / 3
    assert row["is_l_diverse"] is True
    assert row["min_distinct_sensitive"] == 2
    assert row["min_entropy"] == round(h_a, 6)
    assert row["entropy_l"] == round(math.exp(h_a), 6)


def test_skewed_class_shows_entropy_gap(spark):
    # 49/1 split: distinct-l says 2, entropy-l says ~1.1 — the paper's
    # argument for the stronger variant.
    rows = [("Z", "flu")] * 49 + [("Z", "hiv")]
    df = spark.createDataFrame(rows, "zip string, disease string")
    row = l_diversity_profile(df, ["zip"], "disease", l=2).collect()[0]
    assert row["min_distinct_sensitive"] == 2
    p = [49 / 50, 1 / 50]
    h = -(p[0] * math.log(p[0]) + p[1] * math.log(p[1]))
    assert row["min_entropy"] == pytest.approx(round(h, 6), abs=1e-6)
    assert row["entropy_l"] < 1.2


def test_null_sensitive_excluded_null_quasi_groups(spark):
    rows = ROWS + [("A", None), (None, "flu"), (None, "cold")]
    df = spark.createDataFrame(rows, "zip string, disease string")
    row = l_diversity_profile(df, ["zip"], "disease", l=2).collect()[0]
    # (A, NULL disease) is dropped; the NULL-zip class holds 2 rows
    # with 2 distinct diseases.
    assert row["n_rows"] == 10
    assert row["n_classes"] == 4


def test_validation_and_empty(spark):
    df = spark.createDataFrame(ROWS, "zip string, disease string")
    with pytest.raises(ValueError, match="quasi-identifier"):
        l_diversity_profile(df, [], "disease")
    with pytest.raises(ValueError, match="cannot also"):
        l_diversity_profile(df, ["zip"], "zip")
    with pytest.raises(ValueError, match="l must be"):
        l_diversity_profile(df, ["zip"], "disease", l=1)
    empty = df.filter("1 = 0")
    row = l_diversity_profile(empty, ["zip"], "disease", l=2).collect()[0]
    assert row["n_rows"] == 0 and row["is_l_diverse"] is True
    assert row["min_distinct_sensitive"] is None
