"""Event-log forensics: per-stage wall vs Σ executorRunTime vs
Σ executorCpuTime vs shuffle bytes (the BENCH/BASELINE.md recipe, made a
tool). Run a job with SPARK_GRAFT_EVENTLOG=<dir>, then:

    python tools/evlog_stages.py <dir or event file> [top_n]

Prints one line per stage (sorted by wall desc) plus job-floor totals.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def newest(path: str) -> str:
    if os.path.isfile(path):
        return path
    # Spark 4 rolling event logs: <dir>/eventlog_v2_<app>/events_*.zstd
    cands = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith("events_") or f.startswith("app-") \
                    or f.startswith("local-"):
                cands.append(os.path.join(root, f))
    return max(cands, key=os.path.getmtime)


def open_log(path: str):
    if path.endswith(".zstd"):
        import io
        import subprocess

        out = subprocess.run(["zstd", "-dc", path], capture_output=True,
                             check=True)
        return io.StringIO(out.stdout.decode())
    return open(path)


def main() -> None:
    path = newest(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lkg_evlog")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    stages: dict[int, dict] = {}
    agg = defaultdict(lambda: defaultdict(float))
    n_jobs = 0
    app_start = app_end = None
    with open_log(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = e.get("Timestamp")
            elif ev == "SparkListenerApplicationEnd":
                app_end = e.get("Timestamp")
            elif ev == "SparkListenerJobStart":
                n_jobs += 1
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "wall": (si.get("Completion Time", 0)
                             - si.get("Submission Time", 0)) / 1000.0,
                    "tasks": si.get("Number of Tasks", 0),
                }
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                a = agg[sid]
                a["run"] += m.get("Executor Run Time", 0) / 1000.0
                a["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                a["sh_r"] += (sr.get("Remote Bytes Read", 0)
                              + sr.get("Local Bytes Read", 0)) / 1e6
                a["sh_w"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                a["spill"] += m.get("Disk Bytes Spilled", 0) / 1e6

    total_wall = ((app_end - app_start) / 1000.0
                  if app_start and app_end else float("nan"))
    rows = sorted(stages.items(), key=lambda kv: -kv[1]["wall"])
    print(f"file={os.path.basename(path)} app_wall={total_wall:.1f}s "
          f"jobs={n_jobs} stages={len(stages)} "
          f"stage_wall_sum={sum(s['wall'] for s in stages.values()):.1f}s")
    print(f"{'sid':>4} {'wall_s':>7} {'run_s':>8} {'cpu_s':>8} "
          f"{'tasks':>5} {'shR_MB':>8} {'shW_MB':>8} {'spill':>7}  name")
    for sid, s in rows[:top_n]:
        a = agg[sid]
        print(f"{sid:>4} {s['wall']:>7.1f} {a['run']:>8.1f} {a['cpu']:>8.1f} "
              f"{s['tasks']:>5} {a['sh_r']:>8.0f} {a['sh_w']:>8.0f} "
              f"{a['spill']:>7.0f}  {s['name']}")


if __name__ == "__main__":
    main()
