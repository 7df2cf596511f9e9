"""Temporal-join queries: as-of (point-in-time) and interval (range)
joins over the events/orders fixtures — the training-pipeline primitives
``operators/asof.py`` adds beyond the reference surface. Both are
oracle-gated: DuckDB has a native ASOF JOIN, and the interval query's
range predicate is plain SQL, so the scale-shaped engine plans are
value-checked against straightforward declarative baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join, interval_join
from .registry import register


@register(
    "events_asof_last_order",
    oracle="""
    WITH day_orders AS (
        SELECT o_custkey AS user_id, o_orderdate,
               round(sum(o_totalprice), 2) AS day_total
        FROM orders
        GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id,
           o.o_orderdate AS last_order_date,
           o.day_total
    FROM events e
    ASOF LEFT JOIN day_orders o
      ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
    """,
    description="Point-in-time join: each event picks up the latest order-day "
    "rollup of its user as of the event time (per-(key,ts)-unique right side, "
    "inclusive boundary). Engine side is the union+window as-of join — one "
    "shuffle by key, no nested loop — checked row-for-row against DuckDB's "
    "native ASOF LEFT JOIN.",
)
def q_events_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    day_orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_total"))
    )
    j = asof_join(
        ev,
        day_orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderdate", "day_total"],
        inclusive=True,
    )
    return j.select(
        "event_id", "user_id", F.col("o_orderdate").alias("last_order_date"), "day_total"
    )


@register(
    "events_in_first_day_window",
    oracle="""
    WITH win AS (
        SELECT user_id, min(ts) AS w_start,
               min(ts) + INTERVAL 1 DAY AS w_end
        FROM events
        GROUP BY 1
    )
    SELECT e.user_id, count(*) AS n_first_day, min(e.ts) AS first_ts
    FROM events e
    JOIN win w
      ON e.user_id = w.user_id AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY 1
    """,
    description="Interval (range) join: per-user validity windows — "
    "[first event, first event + 1 day) — joined back against the event "
    "stream by time-grid bucketing (equi-join on (key, bucket) + exact "
    "range predicate), never a nested loop. The oracle states the same "
    "join as a plain SQL range predicate.",
)
def q_events_in_first_day_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    win = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 1 DAY"))
    )
    j = interval_join(
        ev,
        win,
        key="user_id",
        left_ts="ts",
        right_start="w_start",
        right_end="w_end",
        bucket="1 day",
        how="inner",
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_first_day"), F.min("ts").alias("first_ts")
    )
