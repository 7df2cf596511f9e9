"""CCNet-style perplexity partitioning (operators/ccnet.py).

Hand-reasoned fixture (the mandatory hand-fixture discipline): six
one-language docs built from a tiny vocabulary so the NLL ORDERING is
forced by construction — docs made of the corpus' most frequent words
score low (head), docs of rare/OOV words score high (tail):

    d1, d2: 'aa aa aa aa'      (most frequent word)    -> lowest NLL
    d3, d4: 'aa bb aa bb'      (mixed)                 -> middle
    d6:     'zz zz zz zz'      (less frequent word)    -> high
    d5:     'cc cc zz zz'      (half OOV — vocab_size=3
            keeps aa(12), zz(6), bb(4); cc(2) is OOV)  -> highest

Model constants: N = 12+6+4 = 22 vocab occurrences, V = 3, so the
add-one denominator is N+V+1 = 26 and p(aa) = 13/26, p(zz) = 7/26,
p(OOV) = 1/26 — each doc's NLL is hand-computable below. With
terciles over 6 docs, q(1/3) sits between the sorted 2nd/3rd values
and q(2/3) between 4th/5th, so {d1,d2}=head, {d3,d4}=middle,
{d5,d6}=tail by construction.
"""

from __future__ import annotations

import math

from proyecto_final_de_big_data_spark.operators.ccnet import (
    perplexity_partition,
)

DOCS = [
    ("d1", "en", "aa aa aa aa"),
    ("d2", "en", "aa aa aa aa"),
    ("d3", "en", "aa bb aa bb"),
    ("d4", "en", "aa bb aa bb"),
    ("d5", "en", "cc cc zz zz"),
    ("d6", "en", "zz zz zz zz"),
]


def _run(spark, rows, vocab_size=3):
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = perplexity_partition(df, vocab_size=vocab_size)
    return {r["doc_id"]: r for r in out.collect()}


def test_bucket_ordering_matches_construction(spark):
    got = _run(spark, DOCS)
    assert {got[d]["bucket"] for d in ("d1", "d2")} == {"head"}
    assert {got[d]["bucket"] for d in ("d3", "d4")} == {"middle"}
    assert {got[d]["bucket"] for d in ("d5", "d6")} == {"tail"}
    # NLLs are ordered as constructed (d5 is the worst: half its
    # tokens are OOV).
    assert got["d1"]["nll"] < got["d3"]["nll"] < got["d6"]["nll"] < got["d5"]["nll"]


def test_nll_hand_computation(spark):
    # Corpus counts: aa=12, zz=6, bb=4 (the vocab at K=3); cc=2 is
    # OOV. N = 22, V = 3, add-one denominator = 26.
    got = _run(spark, DOCS)
    p_aa = 13 / 26
    assert got["d1"]["nll"] == round(-math.log(p_aa), 6)
    p_zz = 7 / 26
    assert got["d6"]["nll"] == round(-math.log(p_zz), 6)
    assert got["d6"]["n_oov"] == 0
    p_oov = 1 / 26
    assert got["d5"]["nll"] == round(
        -(2 * math.log(p_oov) + 2 * math.log(p_zz)) / 4, 6
    )
    assert got["d5"]["n_oov"] == 2
    assert got["d1"]["n_tokens"] == 4


def test_languages_bucket_independently(spark):
    # A second language whose docs all score identically: everything
    # ties at its own terciles and lands in head (ties to the better
    # bucket) regardless of the first language's spread.
    rows = DOCS + [
        ("x1", "fr", "aa aa"),
        ("x2", "fr", "aa aa"),
        ("x3", "fr", "aa aa"),
    ]
    got = _run(spark, rows)
    assert {got[d]["bucket"] for d in ("x1", "x2", "x3")} == {"head"}
    # en buckets unchanged by fr's presence (bounds are per-language)...
    assert got["d1"]["bucket"] == "head" and got["d6"]["bucket"] == "tail"


def test_zero_token_docs_produce_no_row(spark):
    rows = DOCS + [("empty", "en", "   ")]
    got = _run(spark, rows)
    assert "empty" not in got
    assert len(got) == 6


def test_null_lang_buckets_as_own_level(spark):
    # NULL language groups as its own level (the anonymity posture) —
    # a plain equi-join back to the bounds frame would silently drop
    # every NULL-lang document (review finding).
    rows = DOCS + [
        ("n1", None, "aa aa"),
        ("n2", None, "zz zz"),
        ("n3", None, "aa zz"),
    ]
    got = _run(spark, rows)
    assert {"n1", "n2", "n3"} <= set(got)
    assert len(got) == 9
    assert got["n1"]["bucket"] == "head"  # lowest NLL within the NULL group
