"""Schema canonicalization operator.

Reproduces the reference's clean-layer contract (SURVEY §1.3; reference
``src/etl/clean.py:3-41`` + ``scripts/02_spark_etl.py:89-116``) as ONE
reusable transform:

1. case-insensitive synonym-map rename to canonical names;
2. hard-fail when required columns are missing;
3. back-fill optional columns with literal defaults;
4. project down to the canonical column list.

Implemented as a single ``select`` of aliased columns rather than a loop
of ``withColumnRenamed`` — one projection node for Catalyst instead of N,
and the parquet scan reads only the canonical columns (column pruning).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Synonym map in the spirit of the reference's MAPA_COLUMNAS_TLC
# (src/etl/clean.py:3-15): canonical name -> accepted source spellings.
TLC_SYNONYMS: dict[str, list[str]] = {
    "pickup_datetime": ["tpep_pickup_datetime", "lpep_pickup_datetime", "pickup_datetime"],
    "dropoff_datetime": ["tpep_dropoff_datetime", "lpep_dropoff_datetime", "dropoff_datetime"],
    "trip_distance": ["trip_distance"],
    "fare_amount": ["fare_amount"],
    "total_amount": ["total_amount"],
    "passenger_count": ["passenger_count"],
    "payment_type": ["payment_type"],
    "pu_location": ["pulocationid", "pu_location_id", "pu_location"],
    "do_location": ["dolocationid", "do_location_id", "do_location"],
    "vendor_id": ["vendorid", "vendor_id"],
    "ratecode_id": ["ratecodeid", "ratecode_id"],
}


class MissingRequiredColumns(ValueError):
    pass


def canonicalize(
    df: DataFrame,
    synonyms: dict[str, list[str]],
    required: list[str],
    defaults: dict[str, Any],
) -> DataFrame:
    """Rename→validate→backfill→project in one projection.

    ``synonyms`` maps canonical name -> accepted source spellings
    (matched case-insensitively). ``required`` canonical columns must
    resolve or ``MissingRequiredColumns`` is raised (driver-side check —
    no Spark job). ``defaults`` back-fills absent optional columns with
    ``F.lit(default)``. Output column order = ``synonyms`` key order.
    """
    lower_to_actual = {c.lower(): c for c in df.columns}
    projection = []
    resolved: set[str] = set()
    for canonical, spellings in synonyms.items():
        source = next(
            (lower_to_actual[s.lower()] for s in spellings if s.lower() in lower_to_actual),
            None,
        )
        if source is not None:
            projection.append(F.col(source).alias(canonical))
            resolved.add(canonical)
        elif canonical in defaults:
            projection.append(F.lit(defaults[canonical]).alias(canonical))
        # else: column simply absent from output (checked below if required)

    missing = [c for c in required if c not in resolved]
    if missing:
        raise MissingRequiredColumns(f"required columns missing from input: {missing}")
    return df.select(*projection)
