"""st6 unit test: BFS endpoint resolution on the coref fixture shape
(coref_agent.py semantics: bidirectional adjacency, decay, type scoring,
argmax selection; both-unknown edges untouched)."""

from legal_knowledge_graph_spark.corpus import corpus_df, generate_corpus
from legal_knowledge_graph_spark.plans import run_pipeline


def test_coref_resolves_short_alias_calls(spark):
    # corpus index i % 37 == 5 -> coref fixture file with caller_/target_
    n = 80
    files = corpus_df(spark, n, seed=42)
    _, golden, _ = generate_corpus(n, seed=42)
    res = run_pipeline(spark, files, use_lsh=False)
    calls = {
        (r.subject_canonical, r.object_canonical)
        for r in res.edges.where(
            (res.edges.predicate == "function_calls_function")
            & ~res.edges.need_coref).collect()
    }
    expected = {
        (s, o) for s, p, o in golden
        if p == "function_calls_function" and s.startswith("caller_")
    }
    assert expected, "corpus must contain coref fixtures"
    assert expected <= calls
    # resolved edges are type-valid
    bad = res.edges.where(
        (res.edges.predicate == "function_calls_function")
        & ~res.edges.need_coref & ~res.edges.validation_passed).count()
    assert bad == 0
