"""All-pairs weighted-cosine join (operators/apss.py).

Hand-computed fixture discipline: the 3-document tf-idf cosine below
is worked from the definitions with math.log, independent of the
operator and of any SQL restatement; the pure-Python twin then pins
the operator — INCLUDING the L2 prefix filter's losslessness — across
a randomized corpus at a low threshold.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.apss import (
    cosine_similarity_pairs,
    tfidf_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _twin_pairs(rows, threshold):
    """Brute-force tf-idf cosine over all pairs — no pruning."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in rows}
    n = len(rows)
    tf = {i: {} for i, _ in rows}
    for i, ws in toks.items():
        for w in ws:
            tf[i][w] = tf[i].get(w, 0) + 1
    df = {}
    for i in tf:
        for w in tf[i]:
            df[w] = df.get(w, 0) + 1
    wts = {
        i: {
            w: c * math.log(n / df[w])
            for w, c in tf[i].items()
            if c * math.log(n / df[w]) > 0
        }
        for i in tf
    }
    out = []
    ids = sorted(wts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = wts[ids[x]], wts[ids[y]]
            dot = sum(a[w] * b[w] for w in a.keys() & b.keys())
            na = math.sqrt(sum(v * v for v in a.values()))
            nb = math.sqrt(sum(v * v for v in b.values()))
            if na > 0 and nb > 0:
                c = round(dot / (na * nb), 6)
                if c >= threshold:
                    out.append((ids[x], ids[y], c))
    return sorted(out)


def test_hand_worked_three_docs(spark):
    # N=3; df: apple 2, banana 2, cherry 1, dog 1.
    # d1 = (2*ln1.5, ln1.5); d2 = (ln1.5, ln1.5, ln3); d3 = (3*ln3).
    # cos(d1,d2) = (2*ln1.5^2 + ln1.5^2)
    #            / (sqrt(5)*ln1.5 * sqrt(2*ln1.5^2 + ln3^2)).
    rows = [(1, "apple banana apple"), (2, "apple banana cherry"), (3, "dog dog dog")]
    l15, l3 = math.log(1.5), math.log(3.0)
    expected = round(
        (3 * l15 * l15)
        / (math.sqrt(5) * l15 * math.sqrt(2 * l15 * l15 + l3 * l3)),
        6,
    )
    out = cosine_similarity_pairs(
        _docs(spark, rows), "doc_id", "text", threshold=0.4
    ).collect()
    assert len(out) == 1  # d3 shares no term with anyone
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["cosine"] == pytest.approx(expected, abs=1e-6)


def test_identical_docs_cosine_one(spark):
    rows = [(1, "red green blue"), (2, "red green blue"), (3, "x y z")]
    out = cosine_similarity_pairs(
        _docs(spark, rows), "doc_id", "text", threshold=0.99
    ).collect()
    assert [(r["id_a"], r["id_b"], r["cosine"]) for r in out] == [(1, 2, 1.0)]


def test_ubiquitous_terms_carry_no_mass(spark):
    # "the" appears in all docs -> idf 0 -> dropped; the only cosine
    # mass comes from distinctive terms.
    rows = [(1, "the the cat"), (2, "the dog"), (3, "the cat")]
    w = tfidf_weights(_docs(spark, rows), "doc_id", "text").collect()
    assert all(r["term"] != "the" for r in w)
    out = cosine_similarity_pairs(
        _docs(spark, rows), "doc_id", "text", threshold=0.5
    ).collect()
    assert [(r["id_a"], r["id_b"], r["cosine"]) for r in out] == [(1, 3, 1.0)]


def test_python_twin_randomized_low_threshold(spark):
    # Low threshold + Zipf-ish vocabulary: the prefix filter must lose
    # NOTHING relative to the brute-force twin (pairs AND scores).
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (
            i,
            " ".join(
                rng.choice(vocab[: 5 + (i % 20)])
                for _ in range(rng.randint(8, 25))
            ),
        )
        for i in range(30)
    ]
    want = _twin_pairs(rows, 0.3)
    got = sorted(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in cosine_similarity_pairs(
            _docs(spark, rows), "doc_id", "text", threshold=0.3
        ).collect()
    )
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=2e-6)


def test_threshold_validation(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="threshold"):
        cosine_similarity_pairs(df, "doc_id", "text", threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        cosine_similarity_pairs(df, "doc_id", "text", threshold=1.5)
