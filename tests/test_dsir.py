"""DSIR importance selection (operators/dsir.py).

Hand-computed fixture discipline: the unigram fixture's Laplace
log-ratio scores are worked from the definitions as explicit fractions
(math.log of hand-derived numerators/denominators), independent of the
operator and of any SQL restatement; a hashlib twin replicates the
md5 bucket fold to confirm the fixture words collide with nothing.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.dsir import (
    dsir_scores,
    dsir_select_topk,
    hashed_ngram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bucket(gram: str, buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % buckets


def test_hashed_ngram_counts_unigram_and_bigram(spark):
    df = _docs(spark, [(1, "a b a"), (2, "c")])
    uni = {
        (r["id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_counts(df, "doc_id", "text", n=1, buckets=64).collect()
    }
    assert uni[(1, _bucket("a", 64))] == 2
    assert uni[(1, _bucket("b", 64))] == 1
    assert uni[(2, _bucket("c", 64))] == 1
    bi = {
        (r["id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_counts(df, "doc_id", "text", n=2, buckets=64).collect()
    }
    assert bi[(1, _bucket("a b", 64))] == 1
    assert bi[(1, _bucket("b a", 64))] == 1
    assert (2,) not in {k[:1] for k in bi}  # 1 token < n -> no rows


def test_hand_worked_unigram_scores(spark):
    # Target: "cat cat dog" -> counts cat 2, dog 1, total 3; B=1024,
    # alpha=1 -> p_cat=3/1027, p_dog=2/1027, p_unseen=1/1027.
    # Raw corpus: r1="dog dog fish", r2="cat fish" -> q over total 5:
    # q_dog=3/1029, q_fish=3/1029, q_cat=2/1029.
    # score(r1) = 2*ln((2/1027)/(3/1029)) + ln((1/1027)/(3/1029))
    # score(r2) = ln((3/1027)/(2/1029)) + ln((1/1027)/(3/1029))
    B = 1024
    # fixture precondition: the three words land in distinct buckets
    assert len({_bucket(w, B) for w in ["cat", "dog", "fish"]}) == 3
    target = _docs(spark, [(100, "cat cat dog")])
    raw = _docs(spark, [(1, "dog dog fish"), (2, "cat fish")])
    got = {
        r["id"]: (r["n_ngrams"], r["score"])
        for r in dsir_scores(raw, target, "doc_id", "text", n=1, buckets=B).collect()
    }
    exp_r1 = round(
        2 * math.log((2 / 1027) / (3 / 1029))
        + math.log((1 / 1027) / (3 / 1029)),
        6,
    )
    exp_r2 = round(
        math.log((3 / 1027) / (2 / 1029))
        + math.log((1 / 1027) / (3 / 1029)),
        6,
    )
    assert got[1][0] == 3 and got[2][0] == 2
    assert got[1][1] == pytest.approx(exp_r1, abs=2e-6)
    assert got[2][1] == pytest.approx(exp_r2, abs=2e-6)
    # the cat-containing doc is more target-like
    assert got[2][1] > got[1][1]


def test_target_like_docs_rank_first(spark):
    # Raw corpus mixes two styles; the docs sharing the target's
    # bigrams must take the top ranks.
    target = _docs(
        spark,
        [(100, "the quick brown fox jumps"), (101, "quick brown fox runs")],
    )
    raw = _docs(
        spark,
        [
            (1, "lorem ipsum dolor sit amet"),
            (2, "the quick brown fox sleeps"),
            (3, "ipsum dolor sit"),
            (4, "quick brown fox jumps high"),
        ],
    )
    top = dsir_select_topk(raw, target, "doc_id", "text", k=2, n=2).collect()
    assert {r["id"] for r in top} == {2, 4}
    assert [r["rank"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2]


def test_scores_deterministic_across_partitions(spark):
    rows = [(i, f"w{i % 7} w{(i + 1) % 5} w{i % 3}") for i in range(40)]
    raw1 = _docs(spark, rows).repartition(1)
    raw8 = _docs(spark, rows).repartition(8)
    target = _docs(spark, [(99, "w0 w1 w2")])
    a = sorted(map(tuple, dsir_scores(raw1, target, "doc_id", "text").collect()))
    b = sorted(map(tuple, dsir_scores(raw8, target, "doc_id", "text").collect()))
    assert a == b


def test_param_validation(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="n >= 1"):
        hashed_ngram_counts(df, "doc_id", "text", n=0)
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_counts(df, "doc_id", "text", buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_scores(df, df, "doc_id", "text", alpha=0.0)
