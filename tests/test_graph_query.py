"""Graph read-back: by-id lookup + bounded neighbor expansion (S8/J-read
analog of /root/reference/src/neo4j/models.py:100-159)."""

from legal_knowledge_graph_spark.corpus import corpus_df
from legal_knowledge_graph_spark.operators.graph_query import (
    get_node, neighbors, nodes_of_type,
)
from legal_knowledge_graph_spark.plans import run_pipeline
from legal_knowledge_graph_spark.sources.io import materialize_graph


def test_graph_readback(spark, tmp_path):
    res = run_pipeline(spark, corpus_df(spark, 50, seed=42), use_lsh=False)
    nodes, edges = materialize_graph(spark, str(tmp_path), res.nodes, res.edges)

    a_file = nodes_of_type(nodes, "File", limit=1).collect()[0]
    assert get_node(nodes, a_file.entity_id).count() == 1

    hop1 = neighbors(nodes, edges, a_file.entity_id, depth=1)
    rows1 = hop1.collect()
    assert rows1, "a file must have neighbors (repo, license, ...)"
    assert all(r.hop == 1 for r in rows1)
    types1 = {r.entity_type for r in rows1}
    assert "Repo" in types1

    hop2 = neighbors(nodes, edges, a_file.entity_id, depth=2).collect()
    assert len(hop2) > len(rows1)  # second hop reaches sibling entities
    assert {r.hop for r in hop2} == {1, 2}
