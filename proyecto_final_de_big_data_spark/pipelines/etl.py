"""Curated-layer ETL pipeline — the reference's entry point 1
(``scripts/02_spark_etl.py:74-144``, SURVEY §3) as one composable
function chain: canonicalize → validate → back-fill → project →
validity-filter → derive duration/temporal features → optional
sample/limit → optional quantile clip → partitioned parquet write.

Scale design vs the reference:
- reads the dataset ROOT with partition predicates (Catalyst partition
  pruning) instead of constructing ``year=/month=`` paths by hand;
- quantile clip bounds for ALL columns in one pass (vs one full scan
  per column);
- dynamic partition overwrite so only touched partitions rewrite;
- no ``coalesce(1)`` anywhere on data paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from ..operators.canonicalize import TLC_SYNONYMS, canonicalize
from ..operators.clean import clip_to_quantiles, validity_filter
from ..operators.features import with_duration_minutes, with_partition_columns, with_temporal_features

TRIPS_REQUIRED = ["pickup_datetime", "dropoff_datetime", "trip_distance", "fare_amount"]

TRIPS_DEFAULTS: dict[str, Any] = {
    "total_amount": 0.0,
    "passenger_count": 0,
    "payment_type": "desconocido",
    "pu_location": "desconocido",
    "do_location": "desconocido",
    "vendor_id": "desconocido",
    "ratecode_id": "desconocido",
}


@dataclass
class EtlConfig:
    """Unified knob set (the reference's per-script CLI contract C3)."""

    synonyms: dict[str, list[str]] = field(default_factory=lambda: dict(TLC_SYNONYMS))
    required: list[str] = field(default_factory=lambda: list(TRIPS_REQUIRED))
    defaults: dict[str, Any] = field(default_factory=lambda: dict(TRIPS_DEFAULTS))
    positive_cols: tuple[str, ...] = ("trip_distance", "fare_amount")
    not_null_cols: tuple[str, ...] = ("pickup_datetime", "dropoff_datetime")
    clip_cols: tuple[str, ...] = ("trip_distance", "fare_amount", "trip_duration_min")
    clip_lower: float = 0.01
    clip_upper: float = 0.99
    apply_clip: bool = True
    sample_fraction: float | None = None
    max_rows: int | None = None
    seed: int = 42


def curate_trips(raw: DataFrame, config: EtlConfig | None = None) -> DataFrame:
    """Raw trips (any TLC column-spelling variant) → canonical curated frame.

    Output schema: 11 canonical base columns + trip_duration_min,
    pickup_hour, pickup_dow, is_weekend + year/month partition strings
    (FIXTURES.md §1 contract).
    """
    cfg = config or EtlConfig()
    df = canonicalize(raw, cfg.synonyms, cfg.required, cfg.defaults)
    df = validity_filter(df, positive=cfg.positive_cols, not_null=cfg.not_null_cols)
    df = with_duration_minutes(df, "pickup_datetime", "dropoff_datetime", "trip_duration_min")
    df = df.filter(df.trip_duration_min > 0)
    df = with_temporal_features(df, "pickup_datetime", "pickup_hour", "pickup_dow", "is_weekend")
    df = with_partition_columns(df, "pickup_datetime")
    if cfg.sample_fraction is not None and 0 < cfg.sample_fraction < 1:
        df = df.sample(cfg.sample_fraction, seed=cfg.seed)
    if cfg.max_rows is not None:
        df = df.limit(cfg.max_rows)
    if cfg.apply_clip:
        df = clip_to_quantiles(df, list(cfg.clip_cols), cfg.clip_lower, cfg.clip_upper)
    return df


def write_curated(df: DataFrame, path: str) -> None:
    """Partitioned curated sink (S7): dynamic overwrite, year/month layout."""
    df.write.mode("overwrite").partitionBy("year", "month").parquet(path)
