"""Unit tests for operators/incremental.py — snapshot/delta merge
equals one-shot aggregation, retraction semantics, min/max safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.incremental import (
    agg_snapshot,
    merge_snapshots,
    snapshot_stats,
)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def test_merge_equals_one_shot(spark):
    base = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    late = [("a", 5.0), ("b", 20.0), ("c", 7.0)]
    snap = agg_snapshot(_facts(spark, base), ["k"], "v")
    delta = agg_snapshot(_facts(spark, late), ["k"], "v")
    merged = snapshot_stats(
        merge_snapshots(snap, delta, ["k"]), ["k"]
    )
    oneshot = snapshot_stats(
        agg_snapshot(_facts(spark, base + late), ["k"], "v"), ["k"]
    )
    assert sorted(merged.collect()) == sorted(oneshot.collect())


def test_retraction_cancels_rows(spark):
    base = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    snap = agg_snapshot(_facts(spark, base), ["k"], "v")
    undo_b = agg_snapshot(_facts(spark, [("b", 10.0)]), ["k"], "v", weight=-1)
    merged = merge_snapshots(snap, undo_b, ["k"], insert_only=False)
    rows = {r["k"]: r for r in merged.collect()}
    assert set(rows) == {"a"}  # b fully retracted -> key disappears
    assert rows["a"]["n"] == 2 and rows["a"]["sum_v"] == 4.0


def test_retraction_merge_drops_minmax(spark):
    snap = agg_snapshot(_facts(spark, [("a", 1.0), ("a", 9.0)]), ["k"], "v")
    undo = agg_snapshot(_facts(spark, [("a", 9.0)]), ["k"], "v", weight=-1)
    merged = merge_snapshots(snap, undo, ["k"], insert_only=False)
    # keeping a stale min/max after deletes is the classic bug; they
    # must be gone from the schema, not silently wrong
    assert "min_v" not in merged.columns and "max_v" not in merged.columns
    stats = snapshot_stats(merged, ["k"]).first()
    assert stats["n"] == 1 and stats["mean_v"] == 1.0 and stats["std_v"] == 0.0
    assert "min_v" not in snapshot_stats(merged, ["k"]).columns


def test_insert_only_merge_keeps_correct_minmax(spark):
    snap = agg_snapshot(_facts(spark, [("a", 5.0)]), ["k"], "v")
    delta = agg_snapshot(_facts(spark, [("a", 1.0), ("a", 9.0)]), ["k"], "v")
    out = snapshot_stats(
        merge_snapshots(snap, delta, ["k"], insert_only=True), ["k"]
    ).first()
    assert out["min_v"] == 1.0 and out["max_v"] == 9.0 and out["n"] == 3


def test_null_values_do_not_count(spark):
    df = spark.createDataFrame([("a", None), ("a", 2.0)], "k string, v double")
    snap = agg_snapshot(df, ["k"], "v")
    row = snap.first()
    assert row["n"] == 1 and row["sum_v"] == 2.0


def test_streaming_foreachbatch_maintains_mart(spark, tmp_path):
    """The streaming deployment shape: each micro-batch aggregates to a
    delta snapshot and merges into the maintained mart — the mart is
    only ever touched at grain cardinality, the stream never rescans
    history. After the stream drains, the mart equals the one-shot
    aggregation (the unified-model guarantee)."""
    from pyspark.sql import functions as F

    from proyecto_final_de_big_data_spark.catalog import load_table

    d = tmp_path / "ev_stream"
    d.mkdir()
    # Two files -> two micro-batches with maxFilesPerTrigger=1.
    ev = load_table(spark, str("/root/testdata/sf0.001"), "events")
    ev.filter(F.dayofmonth("ts") <= 15).write.parquet(str(d / "a"))
    ev.filter(F.dayofmonth("ts") > 15).write.parquet(str(d / "b"))

    state = {"mart": None}

    def _merge(batch_df, batch_id):
        delta = agg_snapshot(batch_df, ["event_type"], "value")
        if state["mart"] is None:
            merged = delta
        else:
            merged = merge_snapshots(state["mart"], delta, ["event_type"])
        # materialize so the next batch merges against data, not lineage
        state["mart"] = merged.localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        snapshot_stats(state["mart"], ["event_type"]).collect()
    )
    want = sorted(
        snapshot_stats(
            agg_snapshot(ev, ["event_type"], "value"), ["event_type"]
        ).collect()
    )
    # float sums arrive in different merge orders; compare at the
    # snapshot_stats rounding (6dp) except the raw sums, at 4dp
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["event_type"] == w["event_type"] and g["n"] == w["n"]
        assert abs(g["sum_v"] - w["sum_v"]) < 1e-4
        assert abs(g["mean_v"] - w["mean_v"]) < 1e-6
        assert g["min_v"] == w["min_v"] and g["max_v"] == w["max_v"]


def test_retraction_merge_output_is_reentrant(spark):
    # yesterday's retraction-mode mart (no min/max) must merge again
    base = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    snap = agg_snapshot(_facts(spark, base), ["k"], "v")
    undo = agg_snapshot(_facts(spark, [("a", 3.0)]), ["k"], "v", weight=-1)
    day1 = merge_snapshots(snap, undo, ["k"], insert_only=False)
    delta2 = agg_snapshot(_facts(spark, [("c", 5.0)]), ["k"], "v")
    day2 = merge_snapshots(day1, delta2, ["k"], insert_only=False)
    rows = {r["k"]: r for r in day2.collect()}
    assert rows["a"]["n"] == 1 and rows["c"]["sum_v"] == 5.0


def test_insert_only_merge_rejects_minmax_less_snapshot(spark):
    import pytest as _pytest

    snap = agg_snapshot(_facts(spark, [("a", 1.0)]), ["k"], "v")
    undone = merge_snapshots(
        snap,
        agg_snapshot(_facts(spark, [("a", 1.0)]), ["k"], "v"),
        ["k"],
        insert_only=False,
    )
    with _pytest.raises(ValueError):
        merge_snapshots(undone, snap, ["k"], insert_only=True)
