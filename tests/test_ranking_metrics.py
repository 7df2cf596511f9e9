"""Ranking-quality metrics (ml/evaluation.py:ranking_metrics).

Hand-worked fixture (mandatory discipline), binary relevance, k=3:

  q1 truth {a, b, c}; system [a@1, x@2, b@3, y@4]
    DCG@3  = 1/log2(2) + 1/log2(4)            = 1.5
    IDCG@3 = 1/log2(2) + 1/log2(3) + 1/log2(4) = 2.13092975...
    NDCG@3 = 1.5 / 2.13092975 = 0.70392747...; MRR = 1.0; hit.
  q2 truth {z}; system [p@1, q@2] -> 0s across the board.

Graded fixture (rel_col), k=2:

  q1 truth a:2, b:1; system [b@1, a@2]
    DCG  = (2^1-1)/log2(2) + (2^2-1)/log2(3) = 1 + 1.89278926...
    IDCG = 3/log2(2) + 1/log2(3)             = 3.63092975...
    NDCG = 2.89278926 / 3.63092975 = 0.79670766...
  q3 judged only at rel 0 -> n_rel 0 -> NULL ndcg/mrr/hit.
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.ml.evaluation import ranking_metrics


def _row(rows, q, k):
    return next(r for r in rows if r["query"] == q and r["k"] == k)


def test_binary_hand_worked(spark):
    ranked = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3), ("q1", "y", 4),
         ("q2", "p", 1), ("q2", "q", 2)],
        "query string, item string, rank int",
    )
    truth = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "z")],
        "query string, item string",
    )
    rows = ranking_metrics(ranked, truth, ["query"], ["item"], [1, 3]).collect()
    assert len(rows) == 4  # 2 queries x 2 ks

    r = _row(rows, "q1", 3)
    idcg = 1.0 + 1.0 / math.log2(3.0) + 0.5
    assert r["ndcg"] == round(1.5 / idcg, 6)
    assert r["mrr"] == 1.0 and r["hit"] is True
    assert r["n_rel"] == 3 and r["n_ranked"] == 3
    # hits a@1, b@3: precision 2/3, recall 2/3,
    # AP = (P@1 + P@3)/min(3,3) = (1 + 2/3)/3 = 5/9
    assert r["precision"] == round(2.0 / 3.0, 6)
    assert r["recall"] == round(2.0 / 3.0, 6)
    assert r["ap"] == round(5.0 / 9.0, 6)

    r1 = _row(rows, "q1", 1)
    assert r1["ndcg"] == 1.0 and r1["mrr"] == 1.0 and r1["n_ranked"] == 1
    assert r1["precision"] == 1.0 and r1["recall"] == round(1.0 / 3.0, 6)
    assert r1["ap"] == 1.0  # min(n_rel, k) denominator: perfect head

    r2 = _row(rows, "q2", 3)
    assert r2["ndcg"] == 0.0 and r2["mrr"] == 0.0 and r2["hit"] is False
    assert r2["n_rel"] == 1 and r2["n_ranked"] == 2
    assert r2["precision"] == 0.0 and r2["recall"] == 0.0 and r2["ap"] == 0.0


def test_graded_and_zero_rel_query(spark):
    ranked = spark.createDataFrame(
        [("q1", "b", 1), ("q1", "a", 2), ("q3", "m", 1)],
        "query string, item string, rank int",
    )
    truth = spark.createDataFrame(
        [("q1", "a", 2.0), ("q1", "b", 1.0), ("q3", "m", 0.0)],
        "query string, item string, rel double",
    )
    rows = ranking_metrics(
        ranked, truth, ["query"], ["item"], [2], rel_col="rel"
    ).collect()

    r = _row(rows, "q1", 2)
    dcg = 1.0 + 3.0 / math.log2(3.0)
    idcg = 3.0 + 1.0 / math.log2(3.0)
    assert r["ndcg"] == round(dcg / idcg, 6)
    assert r["mrr"] == 1.0 and r["hit"] is True and r["n_rel"] == 2
    # both retrieved rows relevant (grading is binary for P/R/AP)
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["ap"] == 1.0

    r3 = _row(rows, "q3", 2)
    assert r3["n_rel"] == 0
    assert r3["ndcg"] is None and r3["mrr"] is None and r3["hit"] is None
    assert r3["precision"] is None and r3["recall"] is None
    assert r3["ap"] is None


def test_truth_universe_and_missing_system_query(spark):
    # q2 judged but never answered: 0s (missing system side, not NULL).
    ranked = spark.createDataFrame(
        [("q1", "a", 1)], "query string, item string, rank int"
    )
    truth = spark.createDataFrame(
        [("q1", "a"), ("q2", "a")], "query string, item string"
    )
    rows = ranking_metrics(ranked, truth, ["query"], ["item"], [5]).collect()
    r2 = _row(rows, "q2", 5)
    assert r2["ndcg"] == 0.0 and r2["mrr"] == 0.0 and r2["hit"] is False
    assert r2["n_ranked"] == 0
    # q1 ranked-only items beyond truth don't appear as queries.
    assert {r["query"] for r in rows} == {"q1", "q2"}


def test_duplicate_judgements_collapse_to_max(spark):
    ranked = spark.createDataFrame(
        [("q1", "a", 1)], "query string, item string, rank int"
    )
    truth = spark.createDataFrame(
        [("q1", "a", 0.0), ("q1", "a", 2.0)],
        "query string, item string, rel double",
    )
    r = ranking_metrics(
        ranked, truth, ["query"], ["item"], [1], rel_col="rel"
    ).collect()[0]
    assert r["n_rel"] == 1 and r["ndcg"] == 1.0


def test_validation(spark):
    ranked = spark.createDataFrame(
        [("q1", "a", 0)], "query string, item string, rank int"
    )
    truth = spark.createDataFrame(
        [("q1", "a", -1.0)], "query string, item string, rel double"
    )
    with pytest.raises(ValueError, match="distinct positive"):
        ranking_metrics(ranked, truth, ["query"], ["item"], [])
    with pytest.raises(ValueError, match="distinct positive"):
        ranking_metrics(ranked, truth, ["query"], ["item"], [3, 3])
    with pytest.raises(ValueError, match="query_cols"):
        ranking_metrics(ranked, truth, [], ["item"], [1])
    # In-plan guards surface on action (construction stays lazy).
    with pytest.raises(Exception, match="non-positive rank"):
        ranking_metrics(ranked, truth, ["query"], ["item"], [1]).collect()
    ok_rank = spark.createDataFrame(
        [("q1", "a", 1)], "query string, item string, rank int"
    )
    with pytest.raises(Exception, match="negative relevance"):
        ranking_metrics(
            ok_rank, truth, ["query"], ["item"], [1], rel_col="rel"
        ).collect()
