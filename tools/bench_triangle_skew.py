"""Skew evidence for triangle_count's degree-ordered orientation.

Builds a hub graph — one node of degree `hub_deg` (with the WORST-case
id for naive orientation: the smallest, so id-ordering points every hub
edge OUT of the hub) over a uniform background — then:

1. counts wedges under naive id-ordering vs degree-ordering (the wedge
   count IS the join's output size, i.e. the cost driver);
2. wall-times the real triangle_count on the skewed graph and on a
   same-size unskewed control.

Under id-ordering the hub alone contributes C(hub_deg, 2) wedges
(5·10^9 at hub_deg=100k — intractable); degree-ordering bounds every
node's oriented out-degree by O(sqrt(m)) so the skewed graph costs the
same as the control.

Usage: python tools/bench_triangle_skew.py [hub_deg] [n_background]
Prints one JSON line; merge into BENCH/scaling.json under
"triangle_skew" by hand or via --merge.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_graphs(spark, hub_deg: int, n_bg: int):
    """(skewed, control) edge DataFrames, deterministic, built on
    executors. Node ids: hub = 0; background nodes 1..N over a sparse
    random-ish (hash-derived) topology; control replaces the hub edges
    with more background edges."""
    n_nodes = max(hub_deg * 2, 200_000)
    # xxhash64 is signed — fold with abs into [1, n_nodes]; the hub (id 0,
    # the SMALLEST id = worst case for naive orientation) attaches to the
    # first hub_deg background nodes, making it a true supernode inside
    # the same topology
    bg = (
        spark.range(1, n_bg + 1)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % n_nodes + 1)
            .alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n_nodes + 1)
            .alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    hub = spark.range(1, hub_deg + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    extra = spark.range(1, hub_deg + 1).select(
        (F.abs(F.xxhash64(F.col("id"), F.lit(3))) % n_nodes + 1).alias("src"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(4))) % n_nodes + 1).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return bg.unionByName(hub), bg.unionByName(extra)


def wedge_counts(spark, edges) -> dict:
    """Wedges (= wedge-join output rows) under both orientations."""
    e0 = (edges.select(F.least("src", "dst").alias("a"),
                       F.greatest("src", "dst").alias("b"))
          .where(F.col("a") != F.col("b"))
          .dropDuplicates(["a", "b"]).localCheckpoint())
    # id-ordering: out-degree of node a = #edges with a as the min id
    naive = (e0.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
             .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
             .first()["w"])
    deg = (e0.select(F.col("a").alias("node"))
           .unionByName(e0.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    tails = e0.join(da, "a").join(db, "b").select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("tail"))
    ordered = (tails.groupBy("tail").agg(F.count(F.lit(1)).alias("d"))
               .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
               .first()["w"])
    return {"n_edges": e0.count(),
            "wedges_id_ordering": int(naive),
            "wedges_degree_ordering": int(ordered)}


def main() -> None:
    from legal_knowledge_graph_spark.operators.graph_algos import (
        triangle_count,
    )
    from legal_knowledge_graph_spark.session import build_session

    hub_deg = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = build_session(app_name="lkg-tri-skew", master="local[32]",
                          shuffle_partitions=32)
    skewed, control = build_graphs(spark, hub_deg, n_bg)
    skewed = skewed.localCheckpoint()
    control = control.localCheckpoint()

    out = {"hub_deg": hub_deg, "n_background": n_bg,
           "skewed": wedge_counts(spark, skewed),
           "control": wedge_counts(spark, control)}
    # warm
    triangle_count(control.limit(10_000)).write.format("noop") \
        .mode("overwrite").save()
    for name, e in (("control", control), ("skewed", skewed)):
        t0 = time.time()
        res = triangle_count(e)
        res.write.format("noop").mode("overwrite").save()
        out[name]["triangle_count_secs"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
