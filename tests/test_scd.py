"""SCD Type-2 snapshot collapsing (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from proyecto_final_de_big_data_spark.operators.scd import scd2_from_snapshots


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


def test_scd2_basic_runs_and_intervals(spark):
    rows = [
        (1, _d(1), "bronze"),
        (1, _d(2), "bronze"),
        (1, _d(3), "gold"),
        (1, _d(4), "gold"),
        (1, _d(5), "bronze"),  # reverting is a NEW run, not a merge
        (2, _d(1), "silver"),
    ]
    df = spark.createDataFrame(rows, "k long, snap date, tier string")
    out = sorted(
        scd2_from_snapshots(df, "k", ["tier"], "snap").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    got = [(r["k"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out]
    assert got == [
        (1, "bronze", _d(1), _d(3), False),
        (1, "gold", _d(3), _d(5), False),
        (1, "bronze", _d(5), None, True),
        (2, "silver", _d(1), None, True),
    ]


def test_scd2_null_attr_transitions(spark):
    # NULL -> value and value -> NULL are changes; NULL -> NULL is not.
    rows = [(1, _d(1), None), (1, _d(2), None), (1, _d(3), "x"), (1, _d(4), None)]
    df = spark.createDataFrame(rows, "k long, snap date, a string")
    out = sorted(
        scd2_from_snapshots(df, "k", ["a"], "snap").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["a"], r["valid_from"], r["valid_to"]) for r in out] == [
        (None, _d(1), _d(3)),
        ("x", _d(3), _d(4)),
        (None, _d(4), None),
    ]


def test_scd2_multi_attr_and_multi_key(spark):
    rows = [
        (1, "eu", _d(1), "a", 10),
        (1, "eu", _d(2), "a", 20),  # second attr changes -> new run
        (1, "us", _d(1), "a", 10),  # different composite key
    ]
    df = spark.createDataFrame(rows, "k long, region string, snap date, s string, v long")
    out = scd2_from_snapshots(df, ["k", "region"], ["s", "v"], "snap").collect()
    eu = sorted([r for r in out if r["region"] == "eu"], key=lambda r: r["valid_from"])
    assert [(r["v"], r["valid_to"] is None) for r in eu] == [(10, False), (20, True)]
    us = [r for r in out if r["region"] == "us"]
    assert len(us) == 1 and us[0]["is_current"]
