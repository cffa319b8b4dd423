"""Materialize the corpus goldens as parquet so the flagship pipeline is
driver-oracle-checkable (VERDICT r1 #2): the reference's graded artifact is
its emitted triples (/root/reference/src/langgraph_agents/relation_agent.py:327-337),
so the golden (subject, predicate, object) set — computed spec-side in
corpus.py, independently of the Spark pipeline — becomes the DuckDB oracle
table for kg_pipeline_nodes / kg_pipeline_edges.

Writes golden/{sf0.001,sf0.01,sf0.1}/golden_triples.parquet and
golden_nodes.parquet (seed 42, the same sizes __spark_entry__._CORPUS_FILES
uses). Pure driver-side Python + pyarrow — no Spark needed. Re-run after
any corpus/schema change; the files are committed so the driver's DuckDB
can read them at correctness time.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legal_knowledge_graph_spark.corpus import generate_corpus  # noqa: E402

SIZES = {"sf0.001": 60, "sf0.01": 240, "sf0.1": 1000}
ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "golden")


def main() -> None:
    for sf, n in SIZES.items():
        _, gt, gn = generate_corpus(n, seed=42)
        out = os.path.join(ROOT, sf)
        os.makedirs(out, exist_ok=True)
        triples = pa.table({
            "subject_canonical": [t[0] for t in gt],
            "predicate": [t[1] for t in gt],
            "object_canonical": [t[2] for t in gt],
        })
        nodes = pa.table({
            "entity_type": [t[0] for t in gn],
            "canonical_name": [t[1] for t in gn],
        })
        pq.write_table(triples, os.path.join(out, "golden_triples.parquet"))
        pq.write_table(nodes, os.path.join(out, "golden_nodes.parquet"))
        print(f"{sf}: {triples.num_rows} triples, {nodes.num_rows} nodes -> {out}")


if __name__ == "__main__":
    main()
