"""Ingestion utilities (reference S1–S3, ``scripts/00_download_tlc.py``):
HTTP/file parquet downloader with force / skip-missing semantics, a
parquet schema probe (pyarrow first, Spark fallback), and an append-only
JSON ingestion manifest exposed to the engine as an audit table.

All driver-side by design — ingestion happens before the cluster sees
the data. ``file://`` URLs keep the whole path testable offline.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import urllib.error
import urllib.request
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from ..utils.logging import get_logger


def download_file(url: str, dest: str, force: bool = False, logger: logging.Logger | None = None) -> bool:
    """Stream ``url`` to ``dest``. Returns True if a download happened,
    False when the file already existed and ``force`` is off (reference
    ``scripts/00_download_tlc.py:104-106``). Network errors propagate —
    skip-missing policy belongs to the caller's month loop."""
    log = logger or get_logger("ingest")
    if os.path.exists(dest) and not force:
        log.info("already present, use force=True to re-download: %s", dest)
        return False
    log.info("downloading %s", url)
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as out:
        shutil.copyfileobj(resp, out)
    log.info("saved %s", dest)
    return True


def probe_parquet_columns(path: str, logger: logging.Logger | None = None) -> list[str]:
    """Column names of a parquet file: pyarrow footer read (no JVM),
    Spark fallback, ``[]`` if both fail (reference S2,
    ``scripts/00_download_tlc.py:19-43``)."""
    log = logger or get_logger("ingest")
    try:
        import pyarrow.parquet as pq

        return list(pq.ParquetFile(path).schema.names)
    except Exception as err:  # noqa: BLE001 — probe must degrade, not raise
        log.warning("pyarrow probe failed for %s: %s", path, err)
    try:
        spark = SparkSession.builder.master("local[1]").appName("schema-probe").getOrCreate()
        return list(spark.read.parquet(path).columns)
    except Exception as err:  # noqa: BLE001
        log.warning("spark probe failed for %s: %s", path, err)
    return []


#: probe_parquet_ts_unit result meaning "the probe itself broke" (e.g.
#: pyarrow missing, unreadable footer) — distinct from ``None``, which
#: means the probe RAN and the column is absent / not a timestamp.
TS_UNIT_UNKNOWN = "unknown"


def probe_parquet_ts_unit(path: str, column: str = "ts", logger: logging.Logger | None = None) -> str | None:
    """Timestamp unit ('ns' | 'us' | 'ms' | 's') of ``column`` from the
    parquet footer. Accepts a file or a directory of part files (first
    ``*.parquet`` wins — one footer read, no data scan). Used by the
    streaming source to pick a read schema that matches the physical type
    instead of assuming one fixture vintage (fixtures have shipped both
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS)).

    Three-state result so callers can tell "the data is wrong" from "the
    probe is broken" (they warrant opposite reactions — see
    ``streaming.windows.read_events_stream``):

    - unit string — the column is a parquet timestamp of that unit;
    - ``None`` — the probe ran fine and the column is absent or not a
      timestamp (a genuine data/schema problem);
    - ``TS_UNIT_UNKNOWN`` — the probe infrastructure itself failed
      (pyarrow missing, unreadable footer); the file may still be
      perfectly readable. Degrades, never raises.
    """
    log = logger or get_logger("ingest")
    try:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            parts = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
            )
            if not parts:
                return None
            probe = parts[0]
        schema = pq.ParquetFile(probe).schema_arrow
        if column not in schema.names:
            return None
        field_type = schema.field(column).type
        import pyarrow.types as pat

        if pat.is_timestamp(field_type):
            return field_type.unit
        return None
    except Exception as err:  # noqa: BLE001 — probe must degrade, not raise
        log.warning("ts-unit probe failed for %s: %s", path, err)
        return TS_UNIT_UNKNOWN


def build_manifest_record(file_name: str, path: str, year: int | str, month: str) -> dict:
    """One audit row per ingested file: name, bytes, columns, UTC
    timestamp, partition keys (reference ``scripts/00_download_tlc.py:119-128``)."""
    return {
        "file_name": file_name,
        "size_bytes": os.path.getsize(path),
        "columns": probe_parquet_columns(path),
        "downloaded_at": datetime.now(timezone.utc).isoformat(),
        "year": str(year),
        "month": str(month),
    }


def upsert_manifest(manifest_path: str, record: dict, logger: logging.Logger | None = None) -> list[dict]:
    """Replace-then-append keyed on ``file_name`` (reference S3,
    ``scripts/00_download_tlc.py:45-59``); tolerates a corrupt existing
    manifest by starting fresh. Returns the full manifest."""
    log = logger or get_logger("ingest")
    data: list[dict] = []
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path, encoding="utf-8") as f:
                data = json.load(f)
        except json.JSONDecodeError:
            log.warning("existing manifest is not valid JSON, replacing: %s", manifest_path)
            data = []
    data = [r for r in data if r.get("file_name") != record["file_name"]]
    data.append(record)
    with open(manifest_path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, ensure_ascii=True)
    return data


def manifest_table(spark: SparkSession, manifest_path: str) -> DataFrame:
    """The manifest as an engine-queryable ingestion-audit DataFrame
    (SURVEY §1.1 "Manifest → ingestion-audit table")."""
    return spark.read.option("multiLine", "true").json(manifest_path)


def ingest_months(
    base_url: str,
    output_dir: str,
    year: int | str,
    months: list[str],
    file_pattern: str = "yellow_tripdata_{year}-{month}.parquet",
    manifest_path: str | None = None,
    force: bool = False,
    skip_missing: bool = False,
    logger: logging.Logger | None = None,
) -> list[dict]:
    """The reference's download loop: per month, fetch (unless cached),
    probe, upsert manifest. ``skip_missing`` turns a URL error into a
    warn-and-continue (C4 semantics at the ingestion layer)."""
    log = logger or get_logger("ingest")
    os.makedirs(output_dir, exist_ok=True)
    manifest = manifest_path or os.path.join(output_dir, "manifest.json")
    records = []
    for month in months:
        file_name = file_pattern.format(year=year, month=month)
        dest = os.path.join(output_dir, file_name)
        try:
            download_file(f"{base_url}/{file_name}", dest, force=force, logger=log)
        except (urllib.error.HTTPError, urllib.error.URLError, FileNotFoundError) as err:
            if skip_missing:
                log.warning("could not download %s: %s", file_name, err)
                continue
            raise
        record = build_manifest_record(file_name, dest, year, month)
        upsert_manifest(manifest, record, logger=log)
        records.append(record)
    return records
