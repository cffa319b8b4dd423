"""Skew evidence for link_prediction's apex-degree cap.

Candidate pairs enumerate through shared-neighbor apexes, and the pair
set IS the output — a degree-H hub apex contributes C(H, 2) pairs, so
no orientation trick can absorb the skew; the cap is the declared
semantic lever (Adamic-Adar discounts hub apexes as 1/ln d, so the cap
removes exactly the lowest-signal wedges).

1. Quantifies the blow-up at a MATERIALIZABLE hub size: candidate-pair
   counts with and without the cap at hub_small (default 10k -> 5*10^7
   uncapped pairs vs a few M capped).
2. Wall-times the real capped operator on a hub_big graph (default
   100k-degree hub, C(H,2) = 5*10^9 uncapped — intractable) vs a
   same-size unskewed control; capped walls should be comparable.

Usage: python tools/bench_linkpredict_skew.py [hub_big] [hub_small] [n_bg]
Prints one JSON line; merge into BENCH/scaling.json under
"linkpredict_skew".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CAP = 64


def build(spark, hub_deg: int, n_bg: int):
    n_nodes = max(hub_deg * 2, 200_000)
    bg = (
        spark.range(1, n_bg + 1)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % n_nodes + 1)
            .alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n_nodes + 1)
            .alias("dst"))
        .where(F.col("src") != F.col("dst")))
    hub = spark.range(1, hub_deg + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    skewed = bg.unionByName(hub).localCheckpoint()
    control = bg.unionByName(
        spark.range(1, hub_deg + 1).select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(3))) % n_nodes + 1)
            .alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(4))) % n_nodes + 1)
            .alias("dst"))
        .where(F.col("src") != F.col("dst"))).localCheckpoint()
    return skewed, control


def pair_count(spark, edges, cap):
    """Candidate-pair volume (the wedge join's output size) with the
    given apex cap — the cost driver the cap bounds."""
    e0 = (edges.where(F.col("src") != F.col("dst"))
          .select(F.least("src", "dst").alias("a"),
                  F.greatest("src", "dst").alias("b"))
          .dropDuplicates(["a", "b"]).localCheckpoint())
    deg = (e0.select(F.col("a").alias("node"))
           .unionByName(e0.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    apex = deg.where(F.col("degree") >= 2)
    if cap is not None:
        apex = apex.where(F.col("degree") <= cap)
    return (apex.agg(F.sum(F.col("degree") * (F.col("degree") - 1) / 2)
                     .alias("pairs")).collect()[0].pairs or 0)


def timed_run(edges):
    from legal_knowledge_graph_spark.operators.graph_algos import (
        link_prediction,
    )

    t0 = time.time()
    out = link_prediction(edges, max_apex_degree=CAP, top_k=100)
    fp = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(F.xxhash64("a", "b", "common_neighbors")).alias("fp"),
    ).collect()[0]
    return {"secs": round(time.time() - t0, 3), "rows": int(fp.rows),
            "fingerprint": int(fp.fp)}


def main() -> None:
    from legal_knowledge_graph_spark.session import build_session

    hub_big = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hub_small = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_bg = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    spark = build_session(app_name="lkg-linkpredict-skew",
                          master="local[32]", shuffle_partitions=32)
    out = {"cap": CAP, "hub_big": hub_big, "hub_small": hub_small,
           "n_bg": n_bg}

    small, _ = build(spark, hub_small, n_bg)
    out["pairs_small_uncapped"] = int(pair_count(spark, small, None))
    out["pairs_small_capped"] = int(pair_count(spark, small, CAP))

    skewed, control = build(spark, hub_big, n_bg)
    out["pairs_big_uncapped_analytic"] = hub_big * (hub_big - 1) // 2
    out["capped_control"] = timed_run(control)
    out["capped_skewed"] = timed_run(skewed)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
