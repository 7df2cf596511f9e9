"""FP-Growth frequent itemsets + 1->1 rules (operators/itemsets.py).

Hand-worked fixture (the mandatory hand-fixture discipline):

    baskets: {a,b,c} {a,b} {a,c} {a} {b,c}    (5 baskets)
    min_support 0.4  ->  minCount = ceil(0.4*5) = 2

    counts: a=4 b=3 c=3 ab=2 ac=2 bc=2 abc=1(<2, pruned)
    frequent: a(.8) b(.6) c(.6) ab(.4) ac(.4) bc(.4)

    1->1 rules (min_confidence 0):
      a->b 2/4=.5   lift .5/.6  = .833333
      b->a 2/3      lift (2/3)/.8 = .833333
      a->c .5       lift .833333
      c->a 2/3      lift .833333
      b->c 2/3      lift (2/3)/.6 = 1.111111
      c->b 2/3      lift 1.111111
"""

from __future__ import annotations

from itertools import combinations

import pytest

from proyecto_final_de_big_data_spark.operators.itemsets import (
    association_rules_1to1,
    frequent_itemsets,
)

BASKETS = [
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "c"),
    (4, "a"),
    (5, "b"), (5, "c"),
]


def _df(spark, rows=None):
    return spark.createDataFrame(rows or BASKETS, "b long, i string")


def test_hand_worked_itemsets(spark):
    out = frequent_itemsets(_df(spark), "b", "i", min_support=0.4)
    got = {r["itemset"]: (r["freq"], r["support"]) for r in out.collect()}
    assert got == {
        "a": (4, 0.8),
        "b": (3, 0.6),
        "c": (3, 0.6),
        "a, b": (2, 0.4),
        "a, c": (2, 0.4),
        "b, c": (2, 0.4),
    }


def test_hand_worked_rules(spark):
    out = association_rules_1to1(_df(spark), "b", "i", min_support=0.4)
    got = {
        (r["antecedent"], r["consequent"]): (
            r["freq_pair"],
            r["confidence"],
            r["lift"],
        )
        for r in out.collect()
    }
    assert got[("a", "b")] == (2, 0.5, 0.833333)
    assert got[("b", "a")] == (2, 0.666667, 0.833333)
    assert got[("b", "c")] == (2, 0.666667, 1.111111)
    assert got[("c", "b")] == (2, 0.666667, 1.111111)
    assert len(got) == 6


def test_duplicate_lines_collapse_and_cap_guards(spark):
    # duplicate (1, 'a') lines must not inflate counts (support
    # semantics); a basket wider than max_basket drops entirely.
    rows = BASKETS + [(1, "a"), (1, "a")] + [(9, f"w{i}") for i in range(10)]
    out = frequent_itemsets(
        _df(spark, rows), "b", "i", min_support=0.4, max_basket=8
    )
    got = {r["itemset"]: r["freq"] for r in out.collect()}
    assert got["a"] == 4  # still 4 baskets, not 6
    assert not any(k.startswith("w") for k in got)


def test_matches_bruteforce_enumeration(spark):
    # Deterministic pseudo-random baskets; brute-force all itemset
    # sizes in Python and compare exactly (FP-Growth is exact mining,
    # not approximate).
    rows = []
    for b in range(40):
        for j in range(1 + (b * 7) % 5):
            rows.append((b, chr(ord("a") + (b * 31 + j * 17) % 7)))
    out = frequent_itemsets(_df(spark, rows), "b", "i", min_support=0.1)
    got = {r["itemset"]: r["freq"] for r in out.collect()}

    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)
    import math

    min_count = math.ceil(0.1 * n)
    expected = {}
    for size in (1, 2, 3, 4, 5):
        from collections import Counter

        cnt = Counter()
        for items in baskets.values():
            for combo in combinations(sorted(items), size):
                cnt[combo] += 1
        for combo, c in cnt.items():
            if c >= min_count:
                expected[", ".join(combo)] = c
    assert got == expected


def test_validation(spark):
    with pytest.raises(ValueError, match="min_support"):
        frequent_itemsets(_df(spark), "b", "i", min_support=0.0)
    with pytest.raises(ValueError, match="max_basket"):
        frequent_itemsets(_df(spark), "b", "i", 0.5, max_basket=1)
    with pytest.raises(ValueError, match="min_confidence"):
        association_rules_1to1(
            _df(spark), "b", "i", 0.5, min_confidence=1.5
        )
