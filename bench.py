#!/usr/bin/env python
"""Benchmark harness: runs the registered query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE SHORT JSON line:
{"metric": "suite_total_sec", "value": total_sec, "unit": "sec",
 "queries": {...summary...}, "sf": ...}

Per-query timings go to BENCH_DETAIL.json next to this script — the
stdout line is kept small because the driver tail-captures it (round 2's
full 68-query dict overflowed the capture window and parsed as null).

Each query is executed to completion (count() action) — results are not
collected to the driver. A warm-up query primes the JVM/codegen first,
and each query's reported time is the median of $SPARK_GRAFT_BENCH_RUNS
(default 3) executions, per the BASELINE.md protocol.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from pyspark.sql import SparkSession

from proyecto_final_de_big_data_spark.queries import QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Start-loadavg gate (BASELINE.md protocol, mechanical since r10):
    # the r9 committed artifact started at loadavg 5.2 (residual from a
    # prior attestation run) and read 1.25x vs r8 when the same code
    # idle read 0.93x. A bench that starts loaded is noise, so refuse
    # to start until the 1-minute load drains below the gate — waiting
    # up to SPARK_GRAFT_LOAD_WAIT_SEC, then aborting loudly rather
    # than committing a polluted number. SPARK_GRAFT_IGNORE_LOAD=1
    # overrides deliberately (recorded in BENCH_DETAIL.json).
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_START_LOAD", "1.5"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "900"))
    ignore_load = os.environ.get("SPARK_GRAFT_IGNORE_LOAD") == "1"
    waited = 0.0
    while os.getloadavg()[0] >= max_load and not ignore_load:
        if waited >= wait_budget:
            print(
                json.dumps(
                    {
                        "metric": "suite_total_sec",
                        "value": None,
                        "error": "start_load_gate",
                        "load": round(os.getloadavg()[0], 2),
                        "max_start_load": max_load,
                        "hint": "host still loaded after "
                        f"{int(wait_budget)}s; drain it or set "
                        "SPARK_GRAFT_IGNORE_LOAD=1",
                    }
                )
            )
            sys.exit(1)
        print(
            f"# start-load gate: loadavg {os.getloadavg()[0]:.2f} >= "
            f"{max_load}, waiting ({int(waited)}/{int(wait_budget)}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
    start_load = round(os.getloadavg()[0], 2)

    # Vanilla session (same load path as the external correctness
    # harness) so bench can never be green on a query correctness
    # cannot even load. Only sizing/process knobs are set, no semantics
    # confs. The daemon module is process plumbing, not semantics: Spark
    # culls idle Python workers after a HARDCODED minute
    # (PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS), so in a 200+-query
    # suite every Arrow/pandas query whose predecessor ran >1 min ago
    # re-forks its 32-worker pool; forking from a daemon that has already
    # imported numpy/pandas/pyarrow (pydaemon.py) turns that respawn from
    # a concurrent import storm (measured 8-40 s per affected query
    # mid-suite, the r11 stall signature) into a plain fork. Same conf in
    # the production session factory (session.py) — the fix is
    # scale-independent, not a local[32] tune.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.python.daemon.module",
            "proyecto_final_de_big_data_spark.pydaemon",
        )
        .getOrCreate()
    )

    # Warm-up: JVM, codegen, parquet footer caches.
    QUERIES["pricing_summary"].spark_fn(spark, sf_dir).count()

    # MLlib class-loading/JIT and the Python-worker pool are one-time
    # process costs, not per-query work — prime them untimed so the
    # first ML / Pandas-UDF query isn't charged for process startup.
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    tiny = spark.createDataFrame([(float(i), float(i)) for i in range(32)], ["x", "y"])
    assembled = VectorAssembler(inputCols=["x"], outputCol="features").transform(tiny)
    LinearRegression(labelCol="y", featuresCol="features", solver="normal").fit(assembled)

    _warm = pandas_udf(lambda s: s, "double")
    tiny.select(_warm(F.col("x"))).count()

    # Python workers import this package once per process (pulled in by
    # the first mapInPandas closure) — prime that too, on 64 rows.
    from proyecto_final_de_big_data_spark.catalog import load_table
    from proyecto_final_de_big_data_spark.operators.dedup import minhash_signatures

    minhash_signatures(
        load_table(spark, sf_dir, "documents").limit(64), "doc_id", "text", num_hashes=4
    ).count()

    # Median of 3 runs per query (the BASELINE.md protocol): damps
    # one-off contention spikes — a single-run suite total swung 2x on a
    # loaded machine with identical code. The runs are INTERLEAVED
    # round-robin (pass 1 over the whole catalog, then pass 2, then
    # pass 3) rather than back-to-back per query: a correlated host
    # load spike then pollutes at most one of each query's three
    # samples instead of all three, so the median survives it.
    # Host load (1-minute loadavg) is sampled before each pass and
    # recorded in BENCH_DETAIL.json so a slow total is attributable.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in QUERIES}
    pass_loads: list[float] = []
    pass_durations: list[float] = []
    for _ in range(runs):
        pass_loads.append(round(os.getloadavg()[0], 2))
        p0 = time.perf_counter()
        for name, q in QUERIES.items():
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
        pass_durations.append(round(time.perf_counter() - p0, 2))
    # Mid-bench contention gate (r10 verdict item 7): the start gate
    # cannot see load that arrives mid-run (the r10 committed artifact
    # carried a pass at loadavg 15.44), and the 1-minute loadavg
    # sampled between passes is self-polluted by the bench's own
    # 32-thread work — so the mechanical suspect marker compares the
    # PASS WALL TIMES instead: identical code on an idle host runs
    # near-identical passes, and a pass >= 1.5x the fastest one was
    # contended. Flagged per pass in the artifact; the median damps
    # the value, the flag attributes it.
    min_pass = min(pass_durations)
    pass_suspect = [d >= 1.5 * min_pass for d in pass_durations]
    # statistics.median averages the middle pair on even run counts;
    # the previous upper-middle pick biased 2-run timings high.
    timings = {
        name: round(statistics.median(vals), 4) for name, vals in samples.items()
    }

    total = round(sum(timings.values()), 4)

    # Isolated-warm re-measurement of the 3 costliest queries (the
    # BASELINE.md mover-audit protocol, now mechanical): their in-suite
    # medians carry interleaved-pass cold effects (executor-memory
    # churn from 170+ other plans between samples), which polluted
    # round-over-round comparisons for pagerank/ml_train in r6/r7.
    # Back-to-back warm runs right after the suite give the number a
    # human would get re-running the query alone; both are recorded so
    # a mover can be attributed to load/floor without a manual session.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")

    # Previous-run per-query medians (the file this run overwrites):
    # the baseline for the mover audit below. Missing/corrupt -> {}.
    prev_timings: dict[str, float] = {}
    try:
        with open(detail_path, encoding="utf-8") as f:
            prev_detail = json.load(f)
        # Only a same-SF predecessor is a mover baseline — a smoke run
        # at another scale factor would flag everything.
        if prev_detail.get("sf") == sf:
            prev_timings = prev_detail.get("queries", {}) or {}
    except (OSError, ValueError):
        prev_timings = {}

    def _isolated_warm(name: str) -> dict[str, object]:
        vals = []
        for _ in range(runs + 1):
            t0 = time.perf_counter()
            QUERIES[name].spark_fn(spark, sf_dir).count()
            vals.append(time.perf_counter() - t0)
        return {
            # drop the first back-to-back run: it still pays the
            # re-warm after whatever query ran last in the suite
            "median_warm": round(statistics.median(vals[1:]), 4),
            "runs": [round(v, 4) for v in vals],
            "in_suite_median": timings[name],
        }

    top3 = sorted(timings, key=timings.get, reverse=True)[:3]
    isolated_warm: dict[str, dict[str, object]] = {
        name: _isolated_warm(name) for name in top3
    }

    # Mover audit (r10 verdict item 6): the top-3-costliest record
    # missed this round's load-inflated lines (triangle/seq_patterns/
    # ccnet/zorder read 1.5-2.5x slower driver-side but weren't top-3
    # expensive), forcing manual adjudication. Mechanically isolate
    # the top-5 REGRESSIONS vs the previous bench run (shared queries,
    # delta > 0.3 s so sub-noise jitter doesn't spend re-runs) so the
    # artifact itself says load-or-real for every mover.
    movers = sorted(
        (n for n in timings if n in prev_timings),
        key=lambda n: timings[n] - prev_timings[n],
        reverse=True,
    )
    movers = [n for n in movers if timings[n] - prev_timings[n] > 0.3][:5]
    isolated_warm_movers: dict[str, dict[str, object]] = {}
    for name in movers:
        entry = (
            dict(isolated_warm[name])
            if name in isolated_warm
            else _isolated_warm(name)
        )
        entry["prev_in_suite_median"] = prev_timings[name]
        entry["delta_vs_prev"] = round(timings[name] - prev_timings[name], 4)
        isolated_warm_movers[name] = entry
    with open(detail_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "loadavg_per_pass": pass_loads,
                "pass_durations_sec": pass_durations,
                "pass_suspect": pass_suspect,
                "loadavg_end": round(os.getloadavg()[0], 2),
                "start_load_gate": {
                    "start_load": start_load,
                    "max_start_load": max_load,
                    "ignored": ignore_load,
                },
                "protocol": "median of interleaved round-robin passes",
                "isolated_warm_top3": isolated_warm,
                "isolated_warm_movers": isolated_warm_movers,
            },
            f,
            indent=2,
        )
    # Keep the stdout line well under the driver's tail-capture window
    # (~200 chars): totals only; full per-query detail in the file.
    # "load" is the PRE-WARM-UP start sample (the value the start-load
    # gate checked): pass_loads[0] is taken AFTER the bench's own
    # JVM/MLlib/daemon warm-up and therefore reads 1.5-3 even on an
    # idle-gated host, which made the r10/r11 driver runs look
    # contended (PERF "now_bench_ok: false") when the gate had passed
    # at <0.15. Per-pass loads stay in BENCH_DETAIL.json
    # (loadavg_per_pass), self-pollution documented there.
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "load": start_load,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
