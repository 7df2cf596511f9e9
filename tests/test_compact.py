"""Small-file compaction (io/compact.py): plan math, lossless rewrite,
and plan-vs-written agreement."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.io.compact import (
    compact_dataset,
    dataset_file_sizes,
    plan_num_files,
)


def test_plan_num_files_math():
    assert plan_num_files(0, 100) == 1  # empty dataset still gets one file
    assert plan_num_files(100, 100) == 1
    assert plan_num_files(101, 100) == 2
    assert plan_num_files(1000, 100) == 10
    with pytest.raises(ValueError, match="target_file_bytes"):
        plan_num_files(100, 0)


def test_compact_merges_fragments_losslessly(spark, tmp_path):
    frag, out = str(tmp_path / "frag"), str(tmp_path / "out")
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
    df.repartition(20).write.parquet(frag)
    assert len(spark.read.parquet(frag).inputFiles()) == 20

    report = compact_dataset(spark, frag, out, target_file_bytes=1 << 30)
    assert report.n_input_files == 20
    assert report.n_planned_files == 1
    assert report.n_written_files == 1

    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id) s", "sum(v) sv").collect()[0][:] == (
        df.selectExpr("sum(id) s", "sum(v) sv").collect()[0][:]
    )


def test_compact_respects_target_size(spark, tmp_path):
    frag, out = str(tmp_path / "frag"), str(tmp_path / "out")
    spark.range(50_000).selectExpr(
        "id", "repeat('x', 100) AS pad"
    ).repartition(32).write.parquet(frag)
    total = sum(dataset_file_sizes(spark.read.parquet(frag)))
    target = total // 4  # ask for ~4 output files
    report = compact_dataset(spark, frag, out, target_file_bytes=target)
    assert report.n_planned_files in (4, 5)
    assert report.n_written_files == report.n_planned_files
    assert report.n_written_files < report.n_input_files
    assert spark.read.parquet(out).count() == 50_000


def test_compact_handles_paths_with_spaces(spark, tmp_path):
    frag = str(tmp_path / "dir with spaces" / "frag")
    out = str(tmp_path / "out")
    spark.range(100).write.parquet(frag)
    # inputFiles() percent-encodes the space; sizes must still resolve
    sizes = dataset_file_sizes(spark.read.parquet(frag))
    assert sizes and all(s > 0 for s in sizes)
    report = compact_dataset(spark, frag, out, target_file_bytes=1 << 30)
    assert report.n_written_files == 1
    assert spark.read.parquet(out).count() == 100


def test_compact_with_sort_cols_layout(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    frag, out = str(tmp_path / "frag"), str(tmp_path / "out")
    spark.range(20_000).selectExpr("(id * 7919) % 20000 AS k").repartition(
        16
    ).write.parquet(frag)
    report = compact_dataset(spark, frag, out, target_file_bytes=1 << 30, sort_cols="k")
    assert report.n_written_files == 1
    # single sorted file: each row group spans a narrow, increasing slice
    f = glob.glob(f"{out}/*.parquet")[0]
    meta = pq.ParquetFile(f).metadata
    idx = meta.schema.names.index("k")
    prev_max = -1
    for g in range(meta.num_row_groups):
        s = meta.row_group(g).column(idx).statistics
        assert s.min > prev_max
        prev_max = s.max
    assert spark.read.parquet(out).count() == 20_000


def test_cli_optimize(spark, tmp_path):
    from proyecto_final_de_big_data_spark.cli import main

    frag, out = str(tmp_path / "frag"), str(tmp_path / "opt")
    spark.range(5_000).selectExpr("id AS k").repartition(10).write.parquet(frag)
    rc = main(
        [
            "optimize",
            "--master", "local[2]",
            "--input", frag,
            "--output", out,
            "--target-mb", "512",
            "--sort-by", "k",
        ]
    )
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.count() == 5_000
    assert len(back.inputFiles()) == 1
