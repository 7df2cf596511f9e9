"""End-to-end curated-layer ETL over raw TLC-variant input (SURVEY §3
entry point 1), including the partitioned-write round trip."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.io.export import export_table, read_exported
from proyecto_final_de_big_data_spark.pipelines.etl import EtlConfig, curate_trips, write_curated


def _raw_trips(spark):
    rows = []
    for i in range(50):
        pick = dt.datetime(2024, 1 + (i % 2), 1 + (i % 27), i % 24, 5)
        rows.append(
            (
                pick,
                pick + dt.timedelta(minutes=10 + i % 30),
                1.0 + i % 10,
                5.0 + i,
                float(i),
                i % 4,
                str(1 + i % 3),
            )
        )
    # Mixed-case TLC spellings; pu/do/vendor/ratecode absent → defaults
    return spark.createDataFrame(
        rows,
        [
            "Tpep_Pickup_Datetime",
            "tpep_dropoff_datetime",
            "Trip_Distance",
            "fare_amount",
            "Total_Amount",
            "Passenger_Count",
            "payment_type",
        ],
    )


def test_curate_trips_contract(spark):
    curated = curate_trips(_raw_trips(spark), EtlConfig(apply_clip=False))
    expected = {
        "pickup_datetime", "dropoff_datetime", "trip_distance", "fare_amount",
        "total_amount", "passenger_count", "payment_type", "pu_location",
        "do_location", "vendor_id", "ratecode_id", "trip_duration_min",
        "pickup_hour", "pickup_dow", "is_weekend", "year", "month",
    }
    assert set(curated.columns) == expected
    rows = curated.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["trip_duration_min"] > 0
        assert r["is_weekend"] == (1 if r["pickup_dow"] in (1, 7) else 0)
        assert r["pu_location"] == "desconocido"
        assert r["month"] in ("01", "02")


def test_curate_trips_clip_reduces_rows(spark):
    cfg = EtlConfig(apply_clip=True, clip_cols=("fare_amount",), clip_lower=0.1, clip_upper=0.9)
    curated = curate_trips(_raw_trips(spark), cfg)
    assert 0 < curated.count() < 50


def test_partitioned_write_round_trip(spark, tmp_path):
    curated = curate_trips(_raw_trips(spark), EtlConfig(apply_clip=False))
    out = str(tmp_path / "curated")
    write_curated(curated, out)
    back = spark.read.parquet(out)
    assert back.count() == 50
    # partition pruning by predicate on the partition column
    assert back.filter(F.col("month") == "01").count() == curated.filter(F.col("month") == "01").count()


def test_export_formats_round_trip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "n"])
    for fmt in ("parquet", "csv", "json"):
        path = str(tmp_path / f"out_{fmt}")
        export_table(df, path, fmt=fmt, single_file=True)
        back = read_exported(spark, path, fmt)
        assert back.count() == 2
        assert set(back.columns) == {"k", "n"}
