"""Wall-clock evidence that the iterative graph operators hold at a
graph 3 orders of magnitude past the driver queries: a deterministic
hash-derived random digraph (default 1M nodes / 10M edges, built on
executors) through pagerank, HITS, label propagation, k-core, BFS and
triangle counting, each with its production knobs.

At this size every node-sized side exceeds nothing (1M < the 2M
broadcast threshold) — to also exercise the SHUFFLE fallback paths, a
second sweep can be run with n_nodes > 2M. The point recorded here: per-
iteration cost is one join + one agg over the edge table, so wall grows
linearly with edges and rounds, no quadratic blowups, no driver
materialization (the harness checks row counts only).

Usage: python tools/bench_graph_scale.py [n_nodes] [n_edges]
Prints one JSON line; merged into BENCH/scaling.json as "graph_scale".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_edges(spark, n_nodes: int, n_edges: int):
    return (
        spark.range(n_edges)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(11))) % n_nodes).alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(13))) % n_nodes).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )


def main() -> None:
    from legal_knowledge_graph_spark.operators.graph_algos import (
        bfs_distances, hits, k_core, label_propagation, pagerank,
        triangle_count,
    )
    from legal_knowledge_graph_spark.session import build_session

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    spark = build_session(app_name="lkg-graph-scale", master="local[32]",
                          shuffle_partitions=32)
    e = build_edges(spark, n_nodes, n_edges)
    m = e.count()

    runs = {
        "pagerank_10iter": lambda: pagerank(e, n_iter=10),
        "hits_5iter": lambda: hits(e, n_iter=5),
        "label_propagation_5iter": lambda: label_propagation(e, n_iter=5),
        "k_core_k5": lambda: k_core(e, k=5, max_iter=8),
        "bfs_6hops": lambda: bfs_distances(e, [0, 1], max_hops=6),
        "triangle_count": lambda: triangle_count(e),
    }
    out = {"n_nodes": n_nodes, "n_edges_distinct": int(m)}
    for name, fn in runs.items():
        t0 = time.time()
        n_rows = fn().count()
        out[name] = {"secs": round(time.time() - t0, 3),
                     "rows": int(n_rows)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
