"""Dunning LLR keyness (operators/keyness.py).

Hand-worked fixture (mandatory discipline):

  focus 'x': "apple apple banana", "apple cherry"   (A = 5 tokens)
  rest  'y': "banana banana cherry", "cherry date date" (B = 6)

  counts: apple a=3 b=0; banana a=1 b=2; cherry a=1 b=2; date a=0 b=2.
  Overused (a/A > b/B strictly): ONLY apple (3/5 > 0); banana and
  cherry are 0.2 vs 1/3, date is 0 vs 1/3.
  G2(apple) = 2*(3*ln(3/E1) + 0), E1 = 5*3/11 -> 6*ln(2.2) = 4.730744.
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.keyness import llr_keyness


def _docs(spark):
    rows = [
        (1, "x", "apple apple banana"),
        (2, "x", "apple cherry"),
        (3, "y", "banana banana cherry"),
        (4, "y", "cherry date date"),
    ]
    return spark.createDataFrame(rows, "doc_id long, grp string, text string")


def test_hand_worked_keyness(spark):
    rows = llr_keyness(_docs(spark), "grp", "text", "x", k=10).collect()
    assert len(rows) == 1  # only apple is overused in x
    r = rows[0]
    assert (r["term"], r["n_focus"], r["n_rest"], r["rank"]) == ("apple", 3, 0, 1)
    e1 = 5.0 * 3 / 11.0
    assert r["llr"] == round(2.0 * (3 * math.log(3 / e1)), 6)


def test_keyness_other_direction_and_python_twin(spark):
    # The rest-side keyness of the same corpus: date is y's marker.
    rows = llr_keyness(_docs(spark), "grp", "text", "y", k=10).collect()
    terms = [r["term"] for r in rows]
    assert terms[0] == "date"
    # Pure-Python twin on the full arithmetic, both groups.
    def twin(docs, focus):
        from collections import Counter

        fa, fb = Counter(), Counter()
        for _, g, t in docs:
            (fa if g == focus else fb).update(t.lower().split())
        A, B = sum(fa.values()), sum(fb.values())
        out = {}
        for term in set(fa) | set(fb):
            a, b = fa[term], fb[term]
            if not a / A > b / B:
                continue
            e1 = A * (a + b) / (A + B)
            e2 = B * (a + b) / (A + B)
            g2 = 2 * ((a * math.log(a / e1) if a else 0.0)
                      + (b * math.log(b / e2) if b else 0.0))
            out[term] = round(g2, 6)
        return out

    raw = [
        (1, "x", "apple apple banana"),
        (2, "x", "apple cherry"),
        (3, "y", "banana banana cherry"),
        (4, "y", "cherry date date"),
    ]
    for focus in ("x", "y"):
        got = {
            r["term"]: r["llr"]
            for r in llr_keyness(_docs(spark), "grp", "text", focus, k=10).collect()
        }
        assert got == twin(raw, focus)


def test_keyness_min_count_and_validation(spark):
    # min_count=3 drops date (2 occurrences) from y's ranking.
    rows = llr_keyness(_docs(spark), "grp", "text", "y", k=10, min_count=3).collect()
    assert "date" not in [r["term"] for r in rows]
    with pytest.raises(ValueError, match="k >= 1"):
        llr_keyness(_docs(spark), "grp", "text", "x", k=0)
    with pytest.raises(ValueError, match="min_count"):
        llr_keyness(_docs(spark), "grp", "text", "x", min_count=0)
    # The one-sided guard is IN-PLAN (raise_error — construction stays
    # lazy, r10 ADVICE item), so it surfaces on the first action as a
    # Spark-side runtime error carrying the friendly message.
    with pytest.raises(Exception, match="both sides non-empty"):
        llr_keyness(_docs(spark), "grp", "text", "nope").collect()
