"""Overlapping context-window chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunks(spark, text, chunk_size, overlap):
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_size=chunk_size, overlap=overlap
    )
    return [
        (r["chunk_id"], r["chunk_start"], r["n_tokens"], r["chunk_text"])
        for r in out.orderBy("chunk_id").collect()
    ]


def test_short_doc_yields_one_full_chunk(spark):
    assert _chunks(spark, "a b c", 5, 2) == [(0, 0, 3, "a b c")]


def test_exact_size_doc_yields_one_chunk(spark):
    assert _chunks(spark, "a b c d e", 5, 2) == [(0, 0, 5, "a b c d e")]


def test_overlap_windows_cover_every_token(spark):
    # 8 tokens, size 5, overlap 2 -> stride 3 -> chunks at 0, 3: the
    # second chunk is the FINAL one because it reaches the end.
    got = _chunks(spark, "t0 t1 t2 t3 t4 t5 t6 t7", 5, 2)
    assert got == [
        (0, 0, 5, "t0 t1 t2 t3 t4"),
        (1, 3, 5, "t3 t4 t5 t6 t7"),
    ]
    # consecutive chunks share exactly `overlap` tokens
    first, second = got[0][3].split(), got[1][3].split()
    assert first[-2:] == second[:2]


def test_boundary_multiple_of_stride(spark):
    # n = size + stride -> exactly 2 chunks, the last one full.
    toks = " ".join(f"t{i}" for i in range(8))  # size 5, overlap 2 -> 5+3
    got = _chunks(spark, toks, 5, 2)
    assert [g[1] for g in got] == [0, 3]
    assert got[-1][2] == 5


def test_empty_and_whitespace_docs_keep_one_empty_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, "   ")]), chunk_size=4, overlap=1
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert (r["chunk_id"], r["n_tokens"], r["chunk_text"]) == (0, 0, "")


def test_tokens_reconstruct_document(spark):
    # De-overlapped concatenation reproduces the original token stream:
    # take the first `stride` tokens of every chunk except the last.
    text = " ".join(f"w{i}" for i in range(23))
    got = _chunks(spark, text, 6, 2)
    stride = 4
    rebuilt: list[str] = []
    for i, (_, _, _, chunk_text) in enumerate(got):
        toks = chunk_text.split()
        rebuilt.extend(toks if i == len(got) - 1 else toks[:stride])
    # the last chunk overlaps its predecessor; drop the duplicated prefix
    assert " ".join(dict.fromkeys(rebuilt).keys()) == text


def test_keep_cols_carried_through(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id long, text string, lang string"
    )
    out = chunk_documents(df, chunk_size=2, overlap=1, keep_cols=["lang"])
    assert out.columns == [
        "doc_id", "lang", "chunk_id", "chunk_start", "n_tokens", "chunk_text"
    ]
    assert {r["lang"] for r in out.collect()} == {"en"}


def test_overlap_must_be_smaller_than_chunk(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_size=4, overlap=4)


def test_chunking_plan_is_exchange_free(spark):
    """Chunking itself must not shuffle — the only Exchange in a
    chunk-then-profile plan belongs to the profile aggregation."""
    df = _docs(spark, [(1, "a b c d e f")])
    plan = chunk_documents(df, chunk_size=3, overlap=1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
