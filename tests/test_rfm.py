"""RFM segmentation (operators/rfm.py)."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.rfm import rfm_segments


def test_hand_checked_two_bin_rfm(spark):
    # Two customers, n_bins=2. A: last order 2024-01-10 (recency 21d),
    # 3 orders, 300 total. B: last 2024-01-30 (recency 1d), 1 order,
    # 50 total. Median bounds split them exactly:
    #   recency: A above bound -> bin1 -> r_score 2-1=1; B bin0 -> 2
    #   frequency: A bin1 -> f 2; B bin0 -> f 1
    #   monetary: A bin1 -> m 2; B bin0 -> m 1
    rows = [
        ("A", "2024-01-01", 100.0),
        ("A", "2024-01-05", 100.0),
        ("A", "2024-01-10", 100.0),
        ("B", "2024-01-30", 50.0),
    ]
    df = spark.createDataFrame(rows, "c string, ts string, amt double")
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): r.asDict()
        for r in rfm_segments(
            df, "c", "ts", "amt", reference_date="2024-01-31", n_bins=2
        ).collect()
    }
    assert set(got) == {(1, 2, 2), (2, 1, 1)}
    a = got[(1, 2, 2)]
    assert a["n_customers"] == 1
    assert a["avg_recency_days"] == 21.0
    assert a["avg_frequency"] == 3.0
    assert a["avg_monetary"] == 300.0
    b = got[(2, 1, 1)]
    assert b["avg_recency_days"] == 1.0 and b["avg_monetary"] == 50.0


def test_segment_counts_cover_all_customers(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prof = rfm_segments(
        orders, "o_custkey", "o_orderdate", "o_totalprice",
        reference_date="1998-12-31", n_bins=5,
    )
    rows = prof.collect()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:  # scores stay in domain
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_null_timestamp_customer_gets_null_segment(spark):
    rows = [("A", "2024-01-10", 10.0), ("B", None, 20.0), ("C", "2024-01-20", 5.0)]
    df = spark.createDataFrame(rows, "c string, ts string, amt double")
    got = rfm_segments(
        df, "c", "ts", "amt", reference_date="2024-01-31", n_bins=2
    ).collect()
    null_seg = [r for r in got if r["r_score"] is None]
    assert len(null_seg) == 1 and null_seg[0]["n_customers"] == 1
