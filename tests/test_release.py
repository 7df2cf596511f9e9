"""Release publishing + consumer-side verification (pipelines/release.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.pipelines.release import (
    publish_release,
    read_manifest,
    verify_release,
)

SF = "/root/testdata/sf0.001"


def _data(spark, tmp_path) -> str:
    root = str(tmp_path / "data")
    (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("split", F.when(F.col("doc_id") % 5 == 0, "eval").otherwise("train"))
        .write.partitionBy("split")
        .parquet(root)
    )
    return root


def test_publish_then_verify_clean_copy(spark, tmp_path):
    root = _data(spark, tmp_path)
    summary = publish_release(
        spark, root, root, "doc_id", ["text"], ["split", "lang"]
    )
    assert summary["n_groups"] == read_manifest(spark, root).count()
    assert summary["n_columns"] >= 5
    # an untampered copy verifies: zero diverging groups
    assert verify_release(spark, root, root, "doc_id", ["text"], ["split", "lang"]).count() == 0


def test_verify_detects_tampered_copy(spark, tmp_path):
    root = _data(spark, tmp_path)
    publish_release(spark, root, root, "doc_id", ["text"], ["split"])
    # consumer's copy lost some rows
    tampered = str(tmp_path / "tampered")
    spark.read.parquet(root).where(F.col("doc_id") % 97 != 0).write.partitionBy(
        "split"
    ).parquet(tampered)
    diverging = verify_release(
        spark, tampered, root, "doc_id", ["text"], ["split"]
    ).collect()
    assert diverging  # at least one group flagged
    for r in diverging:
        assert (r["mine_n_rows"], r["mine_content_checksum"]) != (
            r["shipped_n_rows"],
            r["shipped_content_checksum"],
        )


def test_publish_quality_report_and_validation(spark, tmp_path):
    from proyecto_final_de_big_data_spark.operators.expectations import (
        in_range,
        not_null,
    )

    root = _data(spark, tmp_path)
    summary = publish_release(
        spark,
        root,
        root,
        "doc_id",
        ["text"],
        ["split"],
        rules=[not_null("doc_id"), in_range("n_chars", 0, 1)],
    )
    # the deliberately-absurd range fails; its name lands in the summary
    assert summary["quality_failed"] == ["in_range(n_chars,0,1)"]
    report = {r["check"]: r["passed"] for r in spark.read.json(f"{root}/_quality").collect()}
    assert report["not_null(doc_id)"] is True

    with pytest.raises(ValueError, match="group column"):
        publish_release(spark, root, root, "doc_id", ["text"], [])


def test_cli_curate_with_publish(spark, tmp_path):
    from proyecto_final_de_big_data_spark.cli import main

    out = str(tmp_path / "rel")
    rc = main(
        [
            "curate",
            "--master", "local[2]",
            "--input", f"{SF}/documents.parquet",
            "--output", out,
            "--split", "train=0.8,eval=0.2",
            "--publish",
            "--manifest-group-cols", "split,lang",
        ]
    )
    assert rc == 0
    manifest = read_manifest(spark, out)
    assert manifest.count() > 0
    assert {"split", "lang", "n_rows", "id_sum", "content_checksum"} <= set(manifest.columns)
    assert spark.read.json(f"{out}/_profile").count() >= 4


def test_verify_handles_null_group_values(spark, tmp_path):
    root = str(tmp_path / "nullgrp")
    spark.createDataFrame(
        [(1, "x", "en"), (2, "y", None), (3, "z", None)],
        "doc_id long, text string, lang string",
    ).write.parquet(root)
    publish_release(spark, root, root, "doc_id", ["text"], ["lang"])
    # untampered copy with a NULL group must verify clean (null-safe join)
    assert verify_release(spark, root, root, "doc_id", ["text"], ["lang"]).count() == 0


def test_cli_publish_precondition_fails_fast(tmp_path):
    from proyecto_final_de_big_data_spark.cli import main

    rc = main(
        [
            "curate",
            "--input", f"{SF}/documents.parquet",
            "--output", str(tmp_path / "x"),
            "--split", "none",
            "--publish",
        ]
    )
    assert rc == 1  # main() converts the ValueError to a nonzero exit
    assert not (tmp_path / "x").exists()  # nothing was written before the error
