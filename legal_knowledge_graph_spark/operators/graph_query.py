"""Graph read-back queries over the materialized node/edge tables.

Spark restatement of the reference's Neo4j read paths
(/root/reference/src/neo4j/models.py:100-159): by-id entity lookup,
typed-node listing, and bounded neighbor expansion (the Cypher
`MATCH (n {id})-[r]-(m)` pattern becomes a bidirectional edge join;
depth>1 iterates frontier joins like the coref BFS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.io import read_graph_table


def load_graph(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame]:
    import os

    return (read_graph_table(spark, os.path.join(root, "graph_nodes")),
            read_graph_table(spark, os.path.join(root, "graph_edges")))


def get_node(nodes: DataFrame, entity_id: str) -> DataFrame:
    """models.py:100-117 analog: lookup by id."""
    return nodes.where(F.col("entity_id") == entity_id)


def nodes_of_type(nodes: DataFrame, entity_type: str, limit: int | None = None) -> DataFrame:
    out = nodes.where(F.col("entity_type") == entity_type)
    return out.limit(limit) if limit else out


def neighbors(
    nodes: DataFrame, edges: DataFrame, entity_id: str, depth: int = 1
) -> DataFrame:
    """models.py:119-159 analog: entities within `depth` hops (edges
    traversed in both directions), with hop distance."""
    bi = edges.select(
        F.col("subject_entity_id").alias("src"),
        F.col("object_entity_id").alias("dst"),
    ).unionByName(edges.select(
        F.col("object_entity_id").alias("src"),
        F.col("subject_entity_id").alias("dst"),
    ))
    frontier = nodes.sparkSession.createDataFrame(
        [(entity_id,)], "node string")
    seen = frontier.withColumn("hop", F.lit(0))
    for hop in range(1, depth + 1):
        step = (
            bi.join(F.broadcast(frontier), frontier["node"] == bi["src"])
            .select(F.col("dst").alias("node")).distinct()
            .join(F.broadcast(seen.select("node")), "node", "left_anti")
        )
        if step.isEmpty():
            break
        seen = seen.unionByName(step.withColumn("hop", F.lit(hop)))
        frontier = step
    return (
        seen.where(F.col("hop") > 0)
        .join(nodes, seen["node"] == nodes["entity_id"])
        .select("entity_id", "entity_type", "canonical_name", "hop")
    )
