"""BM25 relevance scoring (operators/bm25.py)."""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.bm25 import bm25_scores


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _score(tf, idf, dl, avgdl, k1=1.2, b=0.75):
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


CORPUS = [
    (1, "spark runs spark jobs on spark"),
    (2, "duckdb runs sql"),
    (3, "pandas and numpy"),
    (4, "spark sql over parquet files at scale"),
]


def test_scores_match_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           (row.asDict() for row in bm25_scores(df, ["spark", "sql"]).collect())}
    n = 4
    dls = {1: 6, 2: 3, 3: 3, 4: 7}
    avgdl = sum(dls.values()) / 4
    idf_spark = _idf(n, 2)  # docs 1, 4
    idf_sql = _idf(n, 2)  # docs 2, 4
    assert set(out) == {1, 2, 4}
    assert out[3 if 3 in out else 1]  # doc 3 matches nothing
    assert out[1]["n_terms"] == 1
    assert out[4]["n_terms"] == 2
    exp1 = _score(3, idf_spark, dls[1], avgdl)
    exp4 = _score(1, idf_spark, dls[4], avgdl) + _score(1, idf_sql, dls[4], avgdl)
    assert out[1]["score"] == pytest.approx(exp1, abs=1e-6)
    assert out[4]["score"] == pytest.approx(exp4, abs=1e-6)


def test_tf_saturation_not_linear(spark):
    # Doc with tf=3 scores less than 3x a tf=1 doc of the same length.
    df = spark.createDataFrame(
        [(1, "x x x y z"), (2, "x a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["score"] for r in
           (row.asDict() for row in bm25_scores(df, ["x"]).collect())}
    assert out[1] > out[2]
    assert out[1] < 3 * out[2]


def test_length_normalization_prefers_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "x " + "pad " * 20), (2, "x pad")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["score"] for r in
           (row.asDict() for row in bm25_scores(df, ["x"]).collect())}
    assert out[2] > out[1]


def test_case_insensitive_and_validates(spark):
    df = spark.createDataFrame([(1, "Spark SQL")], "doc_id long, text string")
    out = bm25_scores(df, ["SPARK"]).collect()
    assert len(out) == 1 and out[0]["n_terms"] == 1
    with pytest.raises(ValueError):
        bm25_scores(df, [])
