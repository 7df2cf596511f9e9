"""Unit tests for corpus snapshot diffing (operators/snapshot.py)."""

from __future__ import annotations

from proyecto_final_de_big_data_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_summary,
)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "id long, text string"
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["text"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_duplicate_id_is_ambiguous(spark):
    # A duplicate id within a snapshot must surface as 'ambiguous', not
    # get a silent content verdict from an arbitrary representative.
    old = spark.createDataFrame([(1, "a"), (1, "a2")], "id long, text string")
    new = spark.createDataFrame([(1, "a")], "id long, text string")
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["text"]).collect()}
    assert got == {1: "ambiguous"}


def test_snapshot_diff_null_content_matches_dedup_semantics(spark):
    # NULL vs empty-string must NOT be conflated (content_digest's
    # sentinel semantics, shared with the dedup family).
    old = spark.createDataFrame([(1, None), (2, "")], "id long, text string")
    new = spark.createDataFrame([(1, ""), (2, "")], "id long, text string")
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["text"]).collect()}
    assert got == {1: "changed", 2: "unchanged"}


def test_snapshot_diff_summary_counts(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "id long, text string")
    new = spark.createDataFrame([(2, "bb"), (3, "c")], "id long, text string")
    got = {
        r["status"]: (r["n_docs"], r["id_sum"])
        for r in snapshot_diff_summary(old, new, "id", ["text"]).collect()
    }
    assert got == {"removed": (1, 1), "changed": (1, 2), "added": (1, 3)}
