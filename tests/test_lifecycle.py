"""Lifecycle utilities: month/quarter resolution (F10), unified CLI
(C3), skip-missing partition tolerance (C4), ingestion S1-S3, logging
factory (C5). Mirrors the reference's per-script contract
(``scripts/00_download_tlc.py``, ``scripts/02_spark_etl.py:30-86``,
``src/utils/fechas.py``, ``src/utils/logging.py``)."""

from __future__ import annotations

import datetime as dt
import json
import logging

import pytest

from proyecto_final_de_big_data_spark.utils.dates import normalize_month, resolve_months
from proyecto_final_de_big_data_spark.utils.logging import get_logger


# ---------------------------------------------------------------- dates


def test_resolve_single_month_padded():
    assert resolve_months(month=3) == ["03"]
    assert resolve_months(month="11") == ["11"]


def test_resolve_months_list():
    assert resolve_months(months="1,2, 11") == ["01", "02", "11"]


def test_resolve_quarter():
    assert resolve_months(quarter=2) == ["04", "05", "06"]
    assert resolve_months(quarter="4") == ["10", "11", "12"]


@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # none given
        {"month": 1, "quarter": 2},  # two given
        {"month": 1, "months": "1,2", "quarter": 2},
        {"month": 13},
        {"month": "x"},
        {"months": " , "},
        {"quarter": 5},
        {"quarter": "q1"},
    ],
)
def test_resolve_months_rejects(kwargs):
    with pytest.raises(ValueError):
        resolve_months(**kwargs)


def test_normalize_month_bounds():
    assert normalize_month("07") == "07"
    for bad in (0, 13, "x", None):
        with pytest.raises(ValueError):
            normalize_month(bad)


# -------------------------------------------------------------- logging


def test_logger_idempotent_and_structured(capsys):
    log = get_logger("lifecycle-test")
    again = get_logger("lifecycle-test")
    assert log is again
    assert len(log.handlers) == 1
    log.info("hello %s", "world")
    out = capsys.readouterr().out
    assert "| INFO | lifecycle-test | hello world" in out
    assert isinstance(log, logging.Logger)


# ------------------------------------------------------------ ingestion


def _make_source_parquet(spark, path, n=10):
    df = spark.createDataFrame([(i, float(i)) for i in range(n)], ["id", "v"])
    df.toPandas().to_parquet(path)


def test_ingest_months_file_url(spark, tmp_path):
    from proyecto_final_de_big_data_spark.io.ingest import ingest_months, manifest_table

    src = tmp_path / "src"
    src.mkdir()
    _make_source_parquet(spark, str(src / "yellow_tripdata_2024-01.parquet"))
    out = tmp_path / "raw"

    # month 02 absent at the source: skip_missing continues past it
    records = ingest_months(
        f"file://{src}", str(out), 2024, ["01", "02"], skip_missing=True
    )
    assert [r["month"] for r in records] == ["01"]
    assert records[0]["columns"] == ["id", "v"]
    assert records[0]["size_bytes"] > 0

    manifest = json.loads((out / "manifest.json").read_text())
    assert len(manifest) == 1

    # re-ingest without force: cached file, manifest still one record
    ingest_months(f"file://{src}", str(out), 2024, ["01"])
    manifest = json.loads((out / "manifest.json").read_text())
    assert len(manifest) == 1

    audit = manifest_table(spark, str(out / "manifest.json"))
    assert audit.count() == 1
    assert {"file_name", "size_bytes", "columns", "downloaded_at", "year", "month"} <= set(audit.columns)


def test_ingest_months_raises_without_skip_missing(tmp_path):
    from proyecto_final_de_big_data_spark.io.ingest import ingest_months

    with pytest.raises(Exception):
        ingest_months(f"file://{tmp_path}", str(tmp_path / "o"), 2024, ["01"], skip_missing=False)


def test_manifest_upsert_replaces_by_file_name(tmp_path):
    from proyecto_final_de_big_data_spark.io.ingest import upsert_manifest

    mp = str(tmp_path / "manifest.json")
    upsert_manifest(mp, {"file_name": "a.parquet", "size_bytes": 1})
    upsert_manifest(mp, {"file_name": "b.parquet", "size_bytes": 2})
    data = upsert_manifest(mp, {"file_name": "a.parquet", "size_bytes": 99})
    assert len(data) == 2
    assert {r["file_name"]: r["size_bytes"] for r in data} == {"a.parquet": 99, "b.parquet": 2}

    # corrupt manifest → start fresh, don't crash
    (tmp_path / "manifest.json").write_text("not json")
    data = upsert_manifest(mp, {"file_name": "c.parquet", "size_bytes": 3})
    assert [r["file_name"] for r in data] == ["c.parquet"]


def test_probe_parquet_columns_degrades(tmp_path):
    from proyecto_final_de_big_data_spark.io.ingest import probe_parquet_columns

    bad = tmp_path / "not_parquet.parquet"
    bad.write_text("nope")
    assert probe_parquet_columns(str(bad)) == []


# ------------------------------------------------- skip-missing (lake)


def _write_month_partition(spark, root, year, month, n=20):
    rows = []
    for i in range(n):
        pick = dt.datetime(int(year), int(month), 1 + (i % 27), i % 24, 5)
        rows.append((pick, pick + dt.timedelta(minutes=10 + i), 1.0 + i, 5.0 + i))
    df = spark.createDataFrame(
        rows, ["tpep_pickup_datetime", "tpep_dropoff_datetime", "trip_distance", "fare_amount"]
    )
    df.write.mode("overwrite").parquet(f"{root}/year={year}/month={month}")


def test_read_months_skip_missing(spark, tmp_path):
    from proyecto_final_de_big_data_spark.catalog import read_months

    root = str(tmp_path / "raw")
    _write_month_partition(spark, root, 2024, "01")

    df = read_months(spark, root, 2024, ["01", "02"], skip_missing=True)
    assert df.count() == 20
    assert set(df.select("month").distinct().toPandas()["month"]) == {"01"}

    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        read_months(spark, root, 2024, ["01", "02"], skip_missing=False)

    assert read_months(spark, root, 2024, ["03"], skip_missing=True) is None


# ------------------------------------------------------------------ CLI


def test_cli_month_selector_mutual_exclusion(tmp_path):
    from proyecto_final_de_big_data_spark.cli import main

    with pytest.raises(SystemExit):
        main(["etl", "--year", "2024", "--month", "1", "--quarter", "1",
              "--raw-root", "x", "--curated-root", "y"])
    with pytest.raises(SystemExit):
        main(["etl", "--year", "2024", "--raw-root", "x", "--curated-root", "y"])


def test_cli_download_and_etl_end_to_end(spark, tmp_path):
    from proyecto_final_de_big_data_spark.cli import main

    # stage a source "remote" with one month present
    src = tmp_path / "remote"
    src.mkdir()
    _make_source_parquet(spark, str(src / "yellow_tripdata_2024-01.parquet"))
    raw_dl = tmp_path / "downloaded"
    rc = main([
        "download", "--year", "2024", "--months", "1,2", "--skip-missing",
        "--base-url", f"file://{src}", "--output-dir", str(raw_dl),
    ])
    assert rc == 0
    assert (raw_dl / "yellow_tripdata_2024-01.parquet").exists()
    assert (raw_dl / "manifest.json").exists()

    # etl over a partial lake with skip-missing
    raw_root = str(tmp_path / "raw")
    _write_month_partition(spark, raw_root, 2024, "01")
    curated_root = str(tmp_path / "curated")
    rc = main([
        "etl", "--year", "2024", "--months", "1,2", "--skip-missing",
        "--raw-root", raw_root, "--curated-root", curated_root,
        "--no-outliers",
    ])
    assert rc == 0
    curated = spark.read.parquet(curated_root)
    assert curated.count() == 20
    assert "trip_duration_min" in curated.columns


def test_cli_run_exports_queries(tmp_path):
    from proyecto_final_de_big_data_spark.cli import main

    out = str(tmp_path / "exports")
    rc = main([
        "run", "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        "--queries", "kpis,orders_by_priority", "--fmt", "csv", "--single-file",
    ])
    assert rc == 0
    import glob

    assert glob.glob(f"{out}/kpis/part-*.csv")
    assert glob.glob(f"{out}/orders_by_priority/part-*.csv")


def test_cli_train_and_score_round_trip(spark, tmp_path):
    from proyecto_final_de_big_data_spark.cli import main
    from proyecto_final_de_big_data_spark.pipelines.etl import EtlConfig, curate_trips

    raw_root = str(tmp_path / "raw")
    _write_month_partition(spark, raw_root, 2024, "01", n=120)
    from proyecto_final_de_big_data_spark.catalog import read_months

    curated = curate_trips(
        read_months(spark, raw_root, 2024, ["01"]), EtlConfig(apply_clip=False)
    )
    curated_root = str(tmp_path / "curated")
    curated.write.parquet(curated_root)

    model_out = str(tmp_path / "model")
    metrics_out = str(tmp_path / "metrics")
    rc = main([
        "train", "--input", curated_root, "--algo", "lr",
        "--model-out", model_out, "--metrics-out", metrics_out,
    ])
    assert rc == 0
    metrics = spark.read.json(metrics_out)
    row = metrics.collect()[0]
    assert row["rows_train"] + row["rows_test"] == 120
    assert row["rmse"] >= 0

    scored_out = str(tmp_path / "scored")
    rc = main(["score", "--input", curated_root, "--model", model_out, "--output", scored_out])
    assert rc == 0
    scored = spark.read.parquet(scored_out)
    assert scored.count() == 120
    assert "prediction" in scored.columns


def test_cli_run_unknown_query(tmp_path):
    from proyecto_final_de_big_data_spark.cli import main

    rc = main(["run", "--sf-dir", "/root/testdata/sf0.001", "--out", str(tmp_path), "--queries", "nope"])
    assert rc == 1


def test_probe_ts_unit_three_state(tmp_path):
    # unit string for a real timestamp column; None when the probe RAN
    # and the column is absent/non-timestamp; TS_UNIT_UNKNOWN when the
    # probe infrastructure fails (unreadable footer) — callers must be
    # able to tell "data is wrong" from "probe is broken" (r4 advice).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from proyecto_final_de_big_data_spark.io.ingest import (
        TS_UNIT_UNKNOWN,
        probe_parquet_ts_unit,
    )

    good = tmp_path / "good.parquet"
    pq.write_table(
        pa.table({"ts": pa.array([0, 1], type=pa.timestamp("us")), "x": [1, 2]}), good
    )
    assert probe_parquet_ts_unit(str(good)) == "us"
    assert probe_parquet_ts_unit(str(good), column="x") is None
    assert probe_parquet_ts_unit(str(good), column="absent") is None

    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"not parquet at all")
    assert probe_parquet_ts_unit(str(bad)) == TS_UNIT_UNKNOWN


def test_read_events_stream_probe_failure_falls_back(spark, tmp_path, monkeypatch):
    # Probe-infrastructure failure must NOT hard-fail a readable
    # MICROS fixture: the reader falls back to the TimestampType schema
    # with a warning instead of raising (r4 advice).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from proyecto_final_de_big_data_spark.streaming import windows as W

    d = tmp_path / "events"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], type=pa.int64()),
                "ts": pa.array([1_700_000_000_000_000], type=pa.timestamp("us")),
                "user_id": pa.array([7], type=pa.int64()),
                "event_type": ["click"],
                "value": pa.array([1.5], type=pa.float64()),
                "props": ["{}"],
            }
        ),
        d / "part-0.parquet",
    )
    monkeypatch.setattr(
        "proyecto_final_de_big_data_spark.io.ingest.probe_parquet_ts_unit",
        lambda path, column="ts", logger=None: "unknown",
    )
    stream = W.read_events_stream(spark, str(d))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_cli_evaluate_writes_all_artifacts(spark, tmp_path):
    from pyspark.sql import functions as F

    from proyecto_final_de_big_data_spark.cli import main

    scored = spark.createDataFrame(
        [(i / 20.0, i >= 12) for i in range(20)], "score double, y boolean"
    )
    src = str(tmp_path / "scored")
    scored.write.parquet(src)
    out = str(tmp_path / "eval")
    rc = main([
        "evaluate", "--input", src, "--score-col", "score",
        "--label-col", "y", "--lo", "0.0", "--hi", "1.0",
        "--buckets", "64", "--thresholds", "0.3,0.6", "--lift-bins", "4",
        "--probability", "--output", out,
    ])
    assert rc == 0
    auc = spark.read.parquet(f"{out}/auc").first()
    assert auc["auc"] == 1.0  # perfectly ranked fixture
    report = spark.read.parquet(f"{out}/report")
    assert report.count() == 2
    lift = spark.read.parquet(f"{out}/lift")
    assert lift.count() == 4
    cal = spark.read.parquet(f"{out}/calibration").first()
    assert cal["n"] == 20 and cal["brier"] is not None
