"""PrefixSpan sequential patterns (operators/seqmine.py).

Hand-worked fixture (the mandatory hand-fixture discipline):

    s1: a b c     s2: a c b     s3: b a     s4: a a
    min_support 0.5 over 4 sequences -> minCount = 2

    singles: a in 4, b in 3, c in 2            (all frequent)
    pairs:   a->b in {s1, s2} = 2  (frequent)
             a->c in {s1, s2} = 2  (frequent)
             b->c 1, a->a 1, b->a 1, c->b 1    (pruned)
"""

from __future__ import annotations

from itertools import combinations

import pytest

from proyecto_final_de_big_data_spark.operators.seqmine import (
    sequence_frames,
    sequential_patterns,
)

ROWS = [
    ("s1", 1, "a"), ("s1", 2, "b"), ("s1", 3, "c"),
    ("s2", 1, "a"), ("s2", 2, "c"), ("s2", 3, "b"),
    ("s3", 1, "b"), ("s3", 2, "a"),
    ("s4", 1, "a"), ("s4", 2, "a"),
]


def _df(spark, rows=None):
    return spark.createDataFrame(rows or ROWS, "k string, t long, i string")


def test_hand_worked_patterns(spark):
    out = sequential_patterns(
        _df(spark), "k", ["t"], "i", min_support=0.5, max_pattern_length=2
    )
    got = {r["pattern"]: (r["freq"], r["support"]) for r in out.collect()}
    assert got == {
        "a": (4, 1.0),
        "b": (3, 0.75),
        "c": (2, 0.5),
        "a -> b": (2, 0.5),
        "a -> c": (2, 0.5),
    }


def test_order_matters_vs_itemsets(spark):
    # b->a appears only in s3 (support 1): the ORDERED pattern is
    # pruned even though the {a, b} itemset co-occurs in 3 sequences.
    out = sequential_patterns(
        _df(spark), "k", ["t"], "i", min_support=0.5, max_pattern_length=2
    )
    assert "b -> a" not in {r["pattern"] for r in out.collect()}


def test_sequence_frames_order_and_truncation(spark):
    seqs = {
        r["key"]: [s[0] for s in r["sequence"]]
        for r in sequence_frames(_df(spark), "k", ["t"], "i").collect()
    }
    assert seqs["s2"] == ["a", "c", "b"]
    trunc = {
        r["key"]: [s[0] for s in r["sequence"]]
        for r in sequence_frames(
            _df(spark), "k", ["t"], "i", max_seq_len=2
        ).collect()
    }
    assert trunc["s1"] == ["a", "b"]


def test_matches_bruteforce_subsequence_count(spark):
    # Deterministic pseudo-random sequences; brute-force subsequence
    # containment for patterns of length 1 and 2.
    rows = []
    for k in range(25):
        for t in range(1 + (k * 5) % 7):
            rows.append((f"u{k}", t, chr(ord("a") + (k * 13 + t * 7) % 4)))
    out = sequential_patterns(
        _df(spark, rows), "k", ["t"], "i", min_support=0.2,
        max_pattern_length=2,
    )
    got = {r["pattern"]: r["freq"] for r in out.collect()}

    seqs = {}
    for k, t, i in sorted(rows):
        seqs.setdefault(k, []).append(i)
    import math

    min_count = math.ceil(0.2 * len(seqs))
    expected = {}
    alphabet = sorted({i for _, _, i in rows})
    for a in alphabet:
        c = sum(1 for s in seqs.values() if a in s)
        if c >= min_count:
            expected[a] = c
    for a in alphabet:
        for b in alphabet:
            c = sum(
                1
                for s in seqs.values()
                if any(
                    s[i] == a and b in s[i + 1:]
                    for i in range(len(s))
                )
            )
            if c >= min_count:
                expected[f"{a} -> {b}"] = c
    assert got == expected


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="min_support"):
        sequential_patterns(df, "k", ["t"], "i", 0.0)
    with pytest.raises(ValueError, match="order column"):
        sequence_frames(df, "k", [], "i")
    with pytest.raises(ValueError, match="max_seq_len"):
        sequence_frames(df, "k", ["t"], "i", max_seq_len=0)
    with pytest.raises(ValueError, match="max_pattern_length"):
        sequential_patterns(df, "k", ["t"], "i", 0.5, max_pattern_length=0)


def test_null_items_are_excluded(spark):
    # A NULL event carries no sequence information; array_join would
    # otherwise render it as '' inside pattern keys (review finding).
    rows = [("u1", 1, "a"), ("u1", 2, None), ("u1", 3, "b"),
            ("u2", 1, "a"), ("u2", 2, "b")]
    out = sequential_patterns(
        _df(spark, rows), "k", ["t"], "i", min_support=0.5,
        max_pattern_length=2,
    )
    got = {r["pattern"]: r["freq"] for r in out.collect()}
    assert got == {"a": 2, "b": 2, "a -> b": 2}
    assert not any(p == "" or " ->  " in p or p.endswith("-> ") for p in got)
