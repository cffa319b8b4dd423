"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion (N vs 4N executors), sandbox form: the SAME KG-pipeline job on
the SAME parquet input at multiple local[] parallelism levels, each in its
own JVM, with identical outputs asserted.

Protocol (see BENCH/BASELINE.md for the analysis):
- the corpus (realistic ~50 KB source files, FIXTURES §1's stated size
  range) is materialized to parquet ONCE, untimed — the measured job's
  input path is a columnar scan, as in production (Iceberg);
- python workers are pre-warmed by one tiny pass (cluster warmup is not
  steady-state throughput);
- levels default to 2, 8, 32 cores: efficiency is reported for 2->8 and
  8->32. On this single machine, memory bandwidth saturates around 8-12
  concurrent shuffle-heavy tasks (task cpuTime inflates ~3x at 32
  threads while a register-bound burn test scales 30x) — so 2->8 is the
  bandwidth-honest N->4N pair, and 8->32 is reported for transparency.

Usage: python tools/bench_scaling.py [n_files] [content_scale]
Writes BENCH/scaling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
from legal_knowledge_graph_spark.session import build_session
from legal_knowledge_graph_spark.corpus import corpus_df_distributed
n_files = int(sys.argv[1]); scale = int(sys.argv[2]); path = sys.argv[3]
mega = int(sys.argv[4]) if len(sys.argv) > 4 else 0
spark = build_session(app_name="lkg-scale-gen", master="local[32]",
                      shuffle_partitions=32)
corpus_df_distributed(spark, n_files, seed=42, partitions=64,
                      content_scale=scale,
                      mega_files=mega or None).write.mode("overwrite").parquet(path)
print("GEN_DONE")
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from legal_knowledge_graph_spark.session import build_session
from legal_knowledge_graph_spark.plans import run_pipeline
from legal_knowledge_graph_spark.operators.ingest import ingest
from legal_knowledge_graph_spark.operators.mentions import mentions_from_files

cpus = int(sys.argv[1]); input_path = sys.argv[2]
# 2x cores: exactly cores==partitions runs every post-shuffle stage as
# ONE all-cores wave whose stragglers set the stage wall (measured 3x on
# textrank-shaped jobs and 39->29s on the pipeline itself — scaling.json
# `text_scale`); 2x lets early finishers steal the tail
spark = build_session(app_name=f"lkg-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
files = spark.read.parquet(input_path)
mentions_from_files(ingest(files.limit(64))).count()  # warm python workers
t0 = time.time()
# 4 tasks per core: the extraction stage (the dominant cost) must
# have enough partitions to fill every core with load-balance slack —
# at 16 partitions a local[32] run left half the cores idle
res = run_pipeline(spark, files, use_lsh="auto",
                   bucket_by_repo=max(4 * cpus, 16))
n_triples = res.edges.count()
n_nodes = res.nodes.count()
secs = time.time() - t0
print("CHILD_RESULT " + json.dumps(
    {"cpus": cpus, "secs": round(secs, 3), "triples": n_triples,
     "nodes": n_nodes, "tps": round(n_triples / secs, 2)}))
"""


def run_level(cpus: int, input_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO}, str(cpus), input_path],
        capture_output=True, text=True, timeout=3000, cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"child failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # skew mode (VERDICT r4 #5): SPARK_GRAFT_SCALE_MEGA=<files> plants an
    # extreme hot repo (that many files in ONE repo vs a 5-15 median) and
    # MERGES the measured pair into scaling.json under "skew_pair" instead
    # of overwriting the main sweep.
    mega = int(os.environ.get("SPARK_GRAFT_SCALE_MEGA", "0"))
    levels = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALE_LEVELS", "8,32" if mega else "2,8,32").split(",")]
    input_path = f"/tmp/lkg_scale_corpus_{n_files}_{scale}" + (
        f"_mega{mega}" if mega else "")
    if not os.path.isdir(input_path):
        gen = subprocess.run(
            [sys.executable, "-c", _GEN % {"repo": REPO},
             str(n_files), str(scale), input_path, str(mega)],
            capture_output=True, text=True, timeout=3000, cwd=REPO)
        if "GEN_DONE" not in gen.stdout:
            raise RuntimeError(f"corpus gen failed:\n{gen.stderr[-2000:]}")

    results = [run_level(c, input_path) for c in levels]
    for r in results[1:]:
        assert r["triples"] == results[0]["triples"], \
            "outputs must be identical at every parallelism level"
    effs = {}
    for a, b in zip(results, results[1:]):
        ratio = b["cpus"] // a["cpus"]
        effs[f"{a['cpus']}to{b['cpus']}"] = round(
            b["tps"] / (ratio * a["tps"]), 4)
    result = {
        "n_files": n_files, "content_scale": scale,
        "levels": results, "efficiency": effs, "identical_output": True,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "scaling.json")
    # always MERGE into scaling.json: the file accumulates skew/temporal/
    # graph evidence entries that a main-sweep rerun must not destroy
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    if mega:
        result["mega_files"] = mega
        existing["skew_pair"] = result
    else:
        existing.update(result)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
