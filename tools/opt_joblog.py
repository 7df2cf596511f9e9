#!/usr/bin/env python
"""Parse a Spark event log written by tools/opt_measure.py and report,
per job-description label, the jobs/stages/tasks breakdown: job count,
wall time, task time, shuffle bytes — the guide §7 UI reading, headless.

Usage: python tools/opt_joblog.py /tmp/spark-events/<app-id> [label-substr]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def _lines(path):
    """Yield event-log lines from a plain file, a Spark rolling-log
    directory (eventlog_v2_*/events_N_*.zstd), or a single .zstd file.
    The sandbox has no zstd CLI or `zstandard` module; pyarrow's
    bundled codec handles the decompression."""
    import glob
    import os

    if os.path.isdir(path):
        parts = sorted(
            glob.glob(os.path.join(path, "events_*")),
            key=lambda p: int(os.path.basename(p).split("_")[1]),
        )
    else:
        parts = [path]
    for p in parts:
        if p.endswith(".zstd"):
            import pyarrow as pa

            with pa.input_stream(p, compression="zstd") as f:
                buf = b""
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        break
                    buf += chunk
                    *done, buf = buf.split(b"\n")
                    for ln in done:
                        yield ln
                if buf:
                    yield buf
        else:
            with open(p, "rb") as f:
                yield from f


def main() -> None:
    path = sys.argv[1]
    want = sys.argv[2] if len(sys.argv) > 2 else None
    jobs = {}  # id -> {desc, t0, t1, stages: [ids]}
    stages = {}  # id -> {name, t0, t1, tasks, task_time, sread, swrite, input}
    for line in _lines(path):
        try:
            e = json.loads(line)
        except ValueError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "desc": (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "t0": e.get("Submission Time", 0),
                "t1": None,
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
            }
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e.get("Completion Time", 0)
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            # UPDATE the stage record — TaskEnd events for this stage
            # have already accumulated task_time/shuffle/input into it,
            # and assignment would clobber them (they'd all read 0).
            agg = stages.setdefault(si["Stage ID"], {})
            agg.update(
                {
                    "name": si.get("Name", ""),
                    "t0": si.get("Submission Time", 0),
                    "t1": si.get("Completion Time", 0),
                    "tasks": si.get("Number of Tasks", 0),
                }
            )
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            agg = stages.setdefault(sid, {})
            agg["task_time"] = agg.get("task_time", 0) + m.get(
                "Executor Run Time", 0
            )
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            agg["sread"] = (
                agg.get("sread", 0)
                + sr.get("Remote Bytes Read", 0)
                + sr.get("Local Bytes Read", 0)
            )
            agg["fetchwait"] = agg.get("fetchwait", 0) + sr.get(
                "Fetch Wait Time", 0
            )
            agg["swrite"] = agg.get("swrite", 0) + sw.get(
                "Shuffle Bytes Written", 0
            )
            inp = m.get("Input Metrics") or {}
            agg["input"] = agg.get("input", 0) + inp.get("Bytes Read", 0)

    by_desc = defaultdict(
        lambda: {
            "jobs": 0,
            "wall_ms": 0,
            "nstages": 0,
            "ntasks": 0,
            "task_ms": 0,
            "sread": 0,
            "swrite": 0,
            "input": 0,
            "fetchwait": 0,
        }
    )
    for jid in sorted(jobs):
        j = jobs[jid]
        desc = j["desc"] or "(none)"
        if want and want not in desc:
            continue
        d = by_desc[desc]
        d["jobs"] += 1
        if j["t1"]:
            d["wall_ms"] += j["t1"] - j["t0"]
        for sid in j["stages"]:
            s = stages.get(sid)
            if not s or "t1" not in s or not s.get("t1"):
                continue  # skipped stage (reused exchange) or still running
            d["nstages"] += 1
            d["ntasks"] += s.get("tasks", 0)
            d["task_ms"] += s.get("task_time", 0)
            d["sread"] += s.get("sread", 0)
            d["swrite"] += s.get("swrite", 0)
            d["input"] += s.get("input", 0)
            d["fetchwait"] += s.get("fetchwait", 0)

    hdr = (
        f"{'label':58s} {'jobs':>4} {'wall_s':>7} {'stg':>4} {'tasks':>6} "
        f"{'task_s':>7} {'in_MB':>7} {'shW_MB':>7} {'shR_MB':>7}"
    )
    print(hdr)
    for desc, d in by_desc.items():
        print(
            f"{desc[:58]:58s} {d['jobs']:>4} {d['wall_ms'] / 1e3:>7.2f} "
            f"{d['nstages']:>4} {d['ntasks']:>6} {d['task_ms'] / 1e3:>7.2f} "
            f"{d['input'] / 1e6:>7.1f} {d['swrite'] / 1e6:>7.2f} "
            f"{d['sread'] / 1e6:>7.2f}"
        )


if __name__ == "__main__":
    main()
