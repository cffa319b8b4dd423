"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion (N vs 4N executors), sandbox form: the SAME KG-pipeline job on
the SAME input at local[8] and local[32] (separate JVMs), reporting
throughput at both and efficiency = throughput(4N) / (4 * throughput(N)).

The corpus is sized so per-core work dominates fixed job overhead
(a scaling test on an underfilled cluster measures overhead, not
scaling). Corpus rendering happens on executors and is itself part of
the measured pipeline input path (like a real table scan would be).

Usage: python tools/bench_scaling.py [n_files]   (default 12000)
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from legal_knowledge_graph_spark.session import build_session
from legal_knowledge_graph_spark.corpus import corpus_df_distributed
from legal_knowledge_graph_spark.plans import run_pipeline

cpus = int(sys.argv[1]); n_files = int(sys.argv[2])
spark = build_session(app_name=f"lkg-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
scale = int(os.environ.get("SPARK_GRAFT_CONTENT_SCALE", "24"))
files = corpus_df_distributed(spark, n_files, seed=42,
                              partitions=max(cpus * 2, 16),
                              content_scale=scale)
t0 = time.time()
res = run_pipeline(spark, files, use_lsh="auto", bucket_by_repo=max(cpus, 16))
n_triples = res.edges.count()
n_nodes = res.nodes.count()
secs = time.time() - t0
print("CHILD_RESULT " + json.dumps(
    {"cpus": cpus, "secs": round(secs, 3), "triples": n_triples,
     "nodes": n_nodes, "tps": round(n_triples / secs, 2)}))
"""


def run_level(cpus: int, n_files: int) -> dict:
    script = _CHILD % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_files)],
        capture_output=True, text=True, timeout=3000,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    r8 = run_level(8, n_files)
    r32 = run_level(32, n_files)
    assert r8["triples"] == r32["triples"], "results must be identical at both levels"
    eff = r32["tps"] / (4 * r8["tps"])
    result = {
        "n_files": n_files,
        "N": r8, "fourN": r32,
        "scaling_efficiency": round(eff, 4),
        "identical_output": True,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
