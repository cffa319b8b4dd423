"""st7 — QA metrics (deterministic replacement for the LLM quality judge).

The reference's QA agent scores extraction quality with an LLM and may
trigger one backtrack re-run (/root/reference/src/langgraph_agents/
qa_agent.py:102-204, graph.py:188-233). Deterministic extraction is
idempotent, so backtracking degenerates to resume-from-checkpoint (SURVEY
§7.3); what survives is the metrics surface: per-stage counts, validation
rates, per-type groupings (A6-A9 in SURVEY §2.4) and a quality score with
the same issue semantics (no entities / no relations / low validation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_stats(blocks: DataFrame) -> DataFrame:
    """A6 (parser.py:236-256): counts per block_type."""
    return blocks.groupBy("block_type").agg(F.count(F.lit(1)).alias("n")).orderBy("block_type")


def graph_stats(nodes: DataFrame, edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A7 (neo4j/client.py:175-194): node count per type, edge count per
    predicate."""
    return (
        nodes.groupBy("entity_type").agg(F.count(F.lit(1)).alias("n")).orderBy("entity_type"),
        edges.groupBy("predicate").agg(F.count(F.lit(1)).alias("n")).orderBy("predicate"),
    )


def quality_report(nodes: DataFrame, edges: DataFrame) -> dict:
    """A8/A9 + qa_agent score semantics: one small driver-side dict
    (aggregations are distributed; only scalar results are collected)."""
    n_nodes = nodes.count()
    agg = edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.when(F.col("validation_passed"), 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(F.col("need_coref"), 1).otherwise(0)).alias("n_need_coref"),
        F.avg("confidence").alias("avg_conf"),
    ).collect()[0]
    n_edges = agg["n_edges"] or 0
    issues = []
    if n_nodes == 0:
        issues.append("no entities extracted")
    if n_edges == 0:
        issues.append("no relations extracted")
    valid_rate = (agg["n_valid"] / n_edges) if n_edges else 0.0
    if n_edges and valid_rate < 0.8:
        issues.append("low schema-validation rate")
    score = min(1.0, 0.25 * (n_nodes > 0) + 0.25 * (n_edges > 0)
                + 0.5 * valid_rate)
    return {
        "quality_score": round(score, 4),
        "entity_count": n_nodes,
        "relation_count": n_edges,
        "validated_count": int(agg["n_valid"] or 0),
        "need_coref_count": int(agg["n_need_coref"] or 0),
        "avg_confidence": float(agg["avg_conf"] or 0.0),
        "issues": issues,
    }
