"""Unit tests: sequence packing (operators/packing.py) and benchmark
decontamination (operators/decontaminate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.decontaminate import contamination_flags
from proyecto_final_de_big_data_spark.operators.packing import with_pack_chunks


def test_pack_chunks_offsets_and_straddle(spark):
    # Shard "a": docs of 100/100/100 tokens into 256-token chunks:
    # starts at 0, 100, 200 -> chunks 0,0,0; the third (200..299) straddles
    # into chunk 1. Shard "b" packs independently from offset 0.
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 100), (3, "a", 100), (4, "b", 300), (5, "b", 10)],
        ["doc_id", "shard", "n_tokens"],
    )
    out = {
        r["doc_id"]: r
        for r in with_pack_chunks(df, "n_tokens", 256, "shard", "doc_id").collect()
    }
    assert (out[1]["chunk_id"], out[1]["chunk_offset"], out[1]["n_chunks_spanned"]) == (0, 0, 1)
    assert (out[2]["chunk_id"], out[2]["chunk_offset"], out[2]["n_chunks_spanned"]) == (0, 100, 1)
    assert (out[3]["chunk_id"], out[3]["chunk_offset"], out[3]["n_chunks_spanned"]) == (0, 200, 2)
    # Shard b restarts at 0; its 300-token doc spans chunks 0-1.
    assert (out[4]["chunk_id"], out[4]["n_chunks_spanned"]) == (0, 2)
    assert (out[5]["chunk_id"], out[5]["chunk_offset"]) == (1, 300 % 256)


def test_pack_chunks_zero_token_doc_spans_one(spark):
    df = spark.createDataFrame([(1, "a", 0), (2, "a", 256)], ["doc_id", "shard", "n"])
    out = {r["doc_id"]: r for r in with_pack_chunks(df, "n", 256, "shard", "doc_id").collect()}
    assert out[1]["n_chunks_spanned"] == 1
    assert (out[2]["chunk_id"], out[2]["n_chunks_spanned"]) == (0, 1)


def test_pack_chunks_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, "s" if i % 2 else "t", 37 + i) for i in range(100)],
        ["doc_id", "shard", "n"],
    )
    a = sorted(map(tuple, with_pack_chunks(df, "n", 128, "shard", "doc_id").collect()))
    b = sorted(
        map(tuple, with_pack_chunks(df.repartition(11), "n", 128, "shard", "doc_id").collect())
    )
    assert a == b


def test_pack_chunks_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, "a", 5)], ["doc_id", "shard", "n"])
    with pytest.raises(ValueError, match="budget"):
        with_pack_chunks(df, "n", 0, "shard", "doc_id")


def test_contamination_flags_overlap_and_clean(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),   # shares 3-gram with bench
            (2, "completely different words entirely here now"),
            (3, "hi"),                                # short doc: whole-text shingle
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(10, "the quick brown fox runs away"), (11, "hi")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in contamination_flags(docs, bench, "doc_id", "text").collect()}
    assert out[1]["is_contaminated"] and out[1]["n_contaminated_ngrams"] == 2
    assert not out[2]["is_contaminated"] and out[2]["n_contaminated_ngrams"] == 0
    # "hi" shingles to itself; bench doc 11 is also "hi" -> exact match flag
    assert out[3]["is_contaminated"]


def test_contamination_preserves_all_rows(spark):
    docs = spark.createDataFrame([(i, f"unique text {i} aa bb") for i in range(20)], ["doc_id", "text"])
    bench = spark.createDataFrame([(0, "no overlap at all whatsoever")], ["doc_id", "text"])
    out = contamination_flags(docs, bench, "doc_id", "text")
    assert out.count() == 20
    assert out.where(F.col("is_contaminated")).count() == 0
