"""Golden end-to-end gate (SURVEY §5.3): synthetic corpus -> full pipeline
-> P/R >= 0.95 on (subject_canonical, predicate, object_canonical), plus
the invariant suite: sha propagation, determinism, checkpoint-resume,
idempotent materialization."""

import pytest
from pyspark.sql import functions as F

from legal_knowledge_graph_spark.corpus import corpus_df, generate_corpus
from legal_knowledge_graph_spark.plans import KGPipeline, run_pipeline
from legal_knowledge_graph_spark.sources.io import materialize_graph

N = 120


@pytest.fixture(scope="module")
def golden():
    rows, gt, gn = generate_corpus(N, seed=42)
    return set(gt), set(gn)


@pytest.fixture(scope="module")
def result(spark):
    return run_pipeline(spark, corpus_df(spark, N, seed=42), use_lsh=False)


def _pr(got, want):
    tp = len(got & want)
    return (tp / len(got) if got else 0.0, tp / len(want) if want else 0.0)


def test_triples_pr_gate(result, golden):
    gt, _ = golden
    got = {(r.subject_canonical, r.predicate, r.object_canonical)
           for r in result.edges.where(~result.edges.need_coref).collect()}
    p, r = _pr(got, gt)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_nodes_pr_gate(result, golden):
    _, gn = golden
    got = {(r.entity_type, r.canonical_name) for r in result.nodes.collect()}
    p, r = _pr(got, gn)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_lsh_path_matches_goldens(spark, golden):
    gt, _ = golden
    res = run_pipeline(spark, corpus_df(spark, N, seed=42), use_lsh=True)
    got = {(r.subject_canonical, r.predicate, r.object_canonical)
           for r in res.edges.where(~res.edges.need_coref).collect()}
    p, r = _pr(got, gt)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_content_sha_invariant(spark, result):
    """sha256(content) equality end-to-end (BASELINE.json input_hint):
    every stage row's content_sha equals the ingest sha for its doc."""
    ing = (result.ingested.select("doc_key", "content_sha").distinct()
           .withColumnRenamed("content_sha", "ing_sha"))
    for df in (result.mentions, result.triples):
        stage = (df.select("doc_key", "content_sha").distinct()
                 .withColumnRenamed("content_sha", "stage_sha"))
        mismatches = (
            stage.join(ing, "doc_key")
            .where(F.col("stage_sha") != F.col("ing_sha"))
        ).count()
        assert mismatches == 0
    # and the sha really is sha256 of the input content
    import hashlib
    rows, _, _ = generate_corpus(N, seed=42)
    expected = {hashlib.sha256((c or "").encode()).hexdigest()
                for _, _, _, _, c in rows}
    got = {r.ing_sha for r in ing.collect()}
    assert got <= expected


def test_determinism_across_parallelism(spark, result):
    """Same triples and same IDs regardless of partitioning (SURVEY §5.3
    determinism contract — here: 1 vs 16 input partitions)."""
    files = corpus_df(spark, N, seed=42)
    res1 = run_pipeline(spark, files.repartition(1), use_lsh=False)
    res16 = run_pipeline(spark, files.repartition(16), use_lsh=False)
    e1 = sorted(r.edge_id for r in res1.edges.collect())
    e16 = sorted(r.edge_id for r in res16.edges.collect())
    assert e1 == e16
    n1 = sorted(r.entity_id for r in res1.nodes.collect())
    n16 = sorted(r.entity_id for r in res16.nodes.collect())
    assert n1 == n16


def test_checkpoint_resume_equals_single_run(spark, result, tmp_path):
    files = corpus_df(spark, N, seed=42)
    root = str(tmp_path / "ckpt")
    p1 = KGPipeline(spark, checkpoint_root=root, use_lsh=False)
    r1 = p1.run(files)
    e1 = sorted(r.edge_id for r in r1.edges.collect())
    # resume: all stages fingerprint-complete -> read back, no recompute
    p2 = KGPipeline(spark, checkpoint_root=root, use_lsh=False)
    r2 = p2.run(files)
    e2 = sorted(r.edge_id for r in r2.edges.collect())
    direct = sorted(r.edge_id for r in result.edges.collect())
    assert e1 == e2 == direct


def test_materialize_idempotent(spark, result, tmp_path):
    root = str(tmp_path / "graph")
    n1, e1 = materialize_graph(spark, root, result.nodes, result.edges)
    c1 = (n1.count(), e1.count())
    n2, e2 = materialize_graph(spark, root, result.nodes, result.edges)
    assert (n2.count(), e2.count()) == c1
    # dangling edges (unresolved coref) are never materialized (J6)
    assert e2.where(e2.subject_entity_id.isNull()
                    | e2.object_entity_id.isNull()).count() == 0
