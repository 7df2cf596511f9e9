#!/usr/bin/env python
"""Targeted oracle check: run named registered queries against their
DuckDB oracles at a given SF dir in a vanilla driver-emulation session
(local[8], shuffle.partitions=8 — the preflight protocol). Rows-only
queries (oracle=None) are counted, not compared.

Usage: PYTHONPATH=. python tools/oracle_check.py [--sf-dir DIR] q [q ...]
"""
from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    from proyecto_final_de_big_data_spark.oracle import compare, run_oracle
    from proyecto_final_de_big_data_spark.queries import QUERIES

    fails = 0
    for name in args.queries:
        q = QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = q.spark_fn(spark, args.sf_dir)
            if q.oracle is None:
                n = df.count()
                print(f"{name}: rows_only n={n} ({time.perf_counter()-t0:.1f}s)")
                continue
            ok, msg = compare(df, run_oracle(q.oracle, args.sf_dir))
            if not ok:
                fails += 1
            print(
                f"{name}: {'OK' if ok else 'FAIL ' + msg} "
                f"({time.perf_counter()-t0:.1f}s)"
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            fails += 1
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
    print("failures:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
