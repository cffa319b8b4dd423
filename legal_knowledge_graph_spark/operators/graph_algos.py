"""Graph analytics over edge tables: PageRank (plus degree helpers).

The reference exposes the knowledge graph for downstream querying
(/root/reference/src/neo4j/models.py:100-159 read paths; its QA surface
reports entity importance only as mention counts). Ranking entities by
link structure is the natural next query over the same store — and a
canonical iterative-algorithm shape for the engine: one equi-join plus
one aggregation per iteration, lineage cut per step, no driver-side
loops over data.

Scale shape (100 TB): the edge table is the fat side and is joined once
per iteration on its source key; the rank table is node-sized and is
broadcast only while the OBSERVED node count stays under the threshold
(the coref/neighbors discipline), else the join falls back to a shuffle
co-partitioned on the same key every iteration (AQE reuses the
exchange). Dangling mass is recovered from the observe()d contribution
sum riding each iteration's checkpoint — no extra job, no driver
collect of node data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BROADCAST_RANKS_MAX = 2_000_000


def _side(df: DataFrame, n_rows: int) -> DataFrame:
    return F.broadcast(df) if n_rows <= BROADCAST_RANKS_MAX else df


def pagerank(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    damping: float = 0.85, n_iter: int = 10,
) -> DataFrame:
    """PageRank with dangling-mass redistribution, `n_iter` fixed
    iterations (deterministic given the edge set — the oracle unrolls the
    same recurrence in SQL).

    rank_{t+1}(v) = (1-d)/N + d * (sum_{u->v} rank_t(u)/outdeg(u)
                                   + dangling_t / N)

    where dangling_t = 1 - total contributed mass (the rank invariant
    sum(rank_t) = 1 makes the two equal, and the contribution sum rides
    the iteration's checkpoint via observe())."""
    from pyspark.sql import Observation

    # materialize the deduped edge set ONCE: nodes, out-degrees and the
    # adjacency all derive from it (otherwise the upstream join/dedup
    # subtree re-executes three times)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .dropDuplicates(["src", "dst"]).localCheckpoint()
    obs_n = Observation()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .observe(obs_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_nodes = obs_n.get["n"]
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    adj = e.join(outdeg, "src").localCheckpoint()  # static across iterations

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        obs = Observation()
        contribs = (
            adj.join(_side(ranks, n_nodes), ranks["node"] == adj["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
            .observe(obs, F.sum("c").alias("s"))
            .localCheckpoint()
        )
        contributed = obs.get["s"] or 0.0
        dangling = max(0.0, 1.0 - contributed)
        ranks = nodes.join(
            _side(contribs, n_nodes), nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.lit(damping)
             * (F.coalesce(F.col("c"), F.lit(0.0))
                + F.lit(dangling / n_nodes))).alias("rank"),
        )
    return ranks


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree) over a distinct edge set."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .dropDuplicates(["src", "dst"])
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
