"""PMI collocations (operators/collocations.py).

Hand-worked fixture (mandatory discipline), corpus
["a b", "a b", "a c", None, "solo"]:

  unigrams: a=3, b=2, c=1, solo=1 -> N = 7
  adjacent bigrams: (a,b)=2, (a,c)=1 -> B = 3 ("solo" pairs nothing)
  pmi(a,b) = ln(2·49 / (3·3·2)) = ln(49/9)  = 1.694596...
  pmi(a,c) = ln(1·49 / (3·3·1)) = ln(49/9)  — an exact tie,
  broken (w1, w2) ascending -> (a,b) rank 1, (a,c) rank 2.
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.collocations import (
    pmi_collocations,
)


def _docs(spark):
    return spark.createDataFrame(
        [("a b",), ("a b",), ("a c",), (None,), ("solo",)], "text string"
    )


def test_hand_worked_counts_and_pmi(spark):
    rows = pmi_collocations(_docs(spark), "text", k=10, min_count=1).collect()
    assert [(r["w1"], r["w2"], r["rank"]) for r in rows] == [
        ("a", "b", 1),
        ("a", "c", 2),
    ]
    ab = rows[0]
    assert (ab["n_pair"], ab["n_w1"], ab["n_w2"]) == (2, 3, 2)
    assert ab["pmi"] == round(math.log(49.0 / 9.0), 6)
    assert rows[1]["pmi"] == ab["pmi"]  # exact tie, lexicographic order


def test_min_count_floors_hapax_pairs(spark):
    rows = pmi_collocations(_docs(spark), "text", k=10, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]


def test_bigrams_never_cross_documents(spark):
    # "x" ends doc 1 and "y" starts doc 2 — (x, y) must not appear.
    docs = spark.createDataFrame([("a x",), ("y b",)], "text string")
    rows = pmi_collocations(docs, "text", k=10, min_count=1).collect()
    assert ("x", "y") not in {(r["w1"], r["w2"]) for r in rows}
    assert {(r["w1"], r["w2"]) for r in rows} == {("a", "x"), ("y", "b")}


def test_python_twin_on_random_corpus(spark):
    import collections
    import random

    rng = random.Random(13)
    vocab = ["red", "blue", "fish", "cat", "dog", "runs", "fast"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for _ in range(60)
    ]
    uni: collections.Counter = collections.Counter()
    pair: collections.Counter = collections.Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        pair.update(zip(ws, ws[1:]))
    n, b = sum(uni.values()), sum(pair.values())
    twin = sorted(
        (
            (
                -round(math.log(c * n * n / (b * uni[x] * uni[y])), 6),
                x,
                y,
                c,
            )
            for (x, y), c in pair.items()
            if c >= 2
        ),
    )[:15]
    expect = [(x, y, c, -p) for p, x, y, c in twin]

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = pmi_collocations(docs, "text", k=15, min_count=2).collect()
    got = [(r["w1"], r["w2"], r["n_pair"], r["pmi"]) for r in rows]
    assert got == expect


def test_empty_and_single_token_corpus_is_honest_empty(spark):
    docs = spark.createDataFrame([("one",), ("",), (None,)], "text string")
    assert pmi_collocations(docs, "text", k=5, min_count=1).count() == 0


def test_validation(spark):
    with pytest.raises(ValueError, match="k >= 1"):
        pmi_collocations(_docs(spark), "text", k=0)
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(_docs(spark), "text", min_count=0)
