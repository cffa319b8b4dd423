"""Connected components on DataFrames — iterative large-star / small-star.

Implements the alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) mandated by
BASELINE.json north_star for the canonicalization stage. Replaces the
reference's O(n^2) order-dependent greedy clustering
(/root/reference/src/normalization/normalizer.py:128-166) with an
order-free, transitive, distributed equivalent (SURVEY §2.4 A1).

Invariants:
- vertex ids are int64 (hashed form ids); component id = min vertex id.
- converges in O(log n) rounds even for giant components (the skew case:
  a mega-cluster of common alias forms).
- each round is two shuffles (groupBy min + re-emit); lineage is cut with
  localCheckpoint every round so iterative plans don't blow up
  (SURVEY §4.2 "Iterative algorithms").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star round.

    large-star: for each u, connect every strictly-larger neighbor to
    m = min(N(u) ∪ {u}).
    small-star: orient edges large->small; connect every neighbor (all
    <= u) and u itself to m = min(N(u) ∪ {u}).
    Both emitted as (src>dst) canonical pairs.
    """
    if large:
        nbrs = edges.unionByName(edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")))
        grouped = nbrs.groupBy("src").agg(
            F.min("dst").alias("m"), F.collect_set("dst").alias("ns"))
        out = (
            grouped.select(
                "src",
                F.least("m", "src").alias("m"),
                F.explode("ns").alias("v"))
            .where(F.col("v") > F.col("src"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        )
    else:
        oriented = edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        grouped = oriented.groupBy("src").agg(
            F.min("dst").alias("m"), F.collect_set("dst").alias("ns"))
        out = grouped.select(
            "src",
            F.least("m", "src").alias("m"),
            F.array_union("ns", F.array("src")).alias("vs"),
        ).select(
            F.explode("vs").alias("v"), F.col("m")
        ).select(F.col("v").alias("src"), F.col("m").alias("dst"))
    return out.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """edges(src:int64, dst:int64) -> (id:int64, component:int64).

    Component id is the minimum vertex id in the component. Vertices with
    no edges are simply absent — callers coalesce to self.
    """
    cur = (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    # convergence check fused into the per-round materialization (VERDICT r1
    # #7): both sides are deduped canonical sets, so set equality <=>
    # (count, sum(xxhash64)) equality; the metrics ride the localCheckpoint
    # job via observe() — zero extra jobs vs the former two left_anti scans.
    first = cur.agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h")).first()
    prev_sig: tuple | None = (first["n"], first["h"])
    for _ in range(max_iter):
        obs = Observation()
        nxt = _star(_star(cur, large=True), large=False).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).localCheckpoint()
        sig = (obs.get["n"], obs.get["h"])
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    # at convergence every edge points directly at its component min
    comp = cur.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    comp = comp.groupBy("id").agg(F.min("component").alias("component"))
    # component roots map to themselves
    roots = comp.select(F.col("component").alias("id")).distinct().withColumn(
        "component", F.col("id"))
    return comp.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component"))
