"""st5 unit tests: predicate normalization, schema validation, need_coref,
dedup, clamping — exercised with hand-built raw triples (the analog of the
reference's hand-built storage payload, storage.py:186-197)."""

import pytest
from pyspark.sql import functions as F

from legal_knowledge_graph_spark.operators.canonicalize import canonicalize
from legal_knowledge_graph_spark.operators.edge_norm import (
    normalize_edges, normalize_predicates,
)
from legal_knowledge_graph_spark.schema import MENTIONS_SCHEMA, TRIPLES_SCHEMA


def _triples_df(spark, rows):
    """(subject, styp, pred, object, otyp, conf) -> triples frame."""
    full = [("dk", "b0", "sha", s, st, p, o, ot, c, "ev") for s, st, p, o, ot, c in rows]
    return spark.createDataFrame(full, TRIPLES_SCHEMA)


def _form_map(spark, forms):
    m = [("dk", "r", "p", "sha", f"b{i}", "FUNCTION", f"m{i}", t, x, 0, len(x),
          0.9, False, None, {}) for i, (t, x) in enumerate(forms)]
    _, fm = canonicalize(spark.createDataFrame(m, MENTIONS_SCHEMA), spark,
                         use_lsh=False)
    return fm


def test_predicate_alias_exact_and_fuzzy_and_unknown(spark):
    t = _triples_df(spark, [
        ("a", "File", "imports", "numpy", "Module", 0.9),          # alias
        ("a", "File", "file_imports_module", "os", "Module", 0.9),  # canonical
        ("a", "File", "really_imports", "sys", "Module", 0.9),      # fuzzy ⊃ alias
        ("a", "File", "zzz_mystery", "x", "Module", 0.9),            # unknown
    ])
    out = {r.object: r.predicate for r in normalize_predicates(t, spark).collect()}
    assert out["numpy"] == "file_imports_module"
    assert out["os"] == "file_imports_module"
    assert out["sys"] == "file_imports_module"   # containment fallback
    assert out["x"] == "zzz_mystery"             # passthrough (:251-253)


def test_schema_validation_flag_kept_not_dropped(spark):
    fm = _form_map(spark, [
        ("File", "r/f.py"), ("Repo", "r"), ("Module", "numpy"),
        ("Function", "parse_config"),
    ])
    t = _triples_df(spark, [
        ("r/f.py", "File", "file_imports_module", "numpy", "Module", 0.9),
        # signature violation: object should be Module
        ("r/f.py", "File", "file_imports_module", "parse_config", "Function", 0.9),
    ])
    edges = normalize_edges(t, fm, spark).collect()
    by_obj = {e.object: e for e in edges}
    assert by_obj["numpy"].validation_passed is True
    assert by_obj["parse_config"].validation_passed is False  # kept, flagged
    assert len(edges) == 2


def test_need_coref_on_unresolved_endpoint(spark):
    fm = _form_map(spark, [("Function", "caller_x")])
    t = _triples_df(spark, [
        ("caller_x", "Function", "function_calls_function", "pc", "Function", 0.85),
    ])
    e = normalize_edges(t, fm, spark).collect()[0]
    assert e.need_coref is True
    assert e.subject_entity_id is not None and e.object_entity_id is None


def test_confidence_clamp(spark):
    fm = _form_map(spark, [("File", "r/f.py"), ("Repo", "r")])
    t = _triples_df(spark, [
        ("r/f.py", "File", "file_in_repo", "r", "Repo", 1.7),   # out of range
        ("r/f.py", "File", "file_has_license", "r", "Repo", 0.3),
    ])
    out = {e.predicate: e.confidence for e in normalize_edges(t, fm, spark).collect()}
    assert out["file_in_repo"] == 0.5          # relation_agent.py:394-396
    assert out["file_has_license"] == 0.3


def test_spo_dedup(spark):
    fm = _form_map(spark, [("File", "r/f.py"), ("Repo", "r")])
    t = _triples_df(spark, [
        ("r/f.py", "File", "file_in_repo", "r", "Repo", 1.0),
        ("r/f.py", "File", "file_in_repo", "r", "Repo", 0.8),
    ])
    edges = normalize_edges(t, fm, spark).collect()
    assert len(edges) == 1
    assert edges[0].confidence == 1.0  # max witness


def test_fuzzy_fallback_keeps_type_differing_triples(spark):
    """ADVICE r1 (medium): two triples sharing (doc, s, p, o) text but
    differing in endpoint types must BOTH survive the fuzzy-predicate
    window (types are part of triple identity)."""
    t = _triples_df(spark, [
        ("a", "File", "really_imports", "x", "Module", 0.9),
        ("a", "File", "really_imports", "x", "Function", 0.9),
    ])
    out = normalize_predicates(t, spark).collect()
    assert len(out) == 2
    assert {r.object_type for r in out} == {"Module", "Function"}
    assert all(r.predicate == "file_imports_module" for r in out)


def test_normalize_edges_threaded_count_is_jobfree(spark):
    """VERDICT r4 #2: the form-map size rides canonicalize's checkpoint
    observe() to normalize_edges — building the edge plan schedules ZERO
    jobs (the former standalone form_map.count() is gone)."""
    fm = _form_map(spark, [("File", "r/f.py"), ("Repo", "r")])
    assert getattr(fm, "_kg_n_forms", None) == 2
    t = _triples_df(spark, [
        ("r/f.py", "File", "file_in_repo", "r", "Repo", 0.9),
    ])
    sc = spark.sparkContext
    sc.setJobGroup("edgeplan", "edge plan construction must be job-free")
    try:
        edges = normalize_edges(t, fm, spark)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("edgeplan")) == []
    # explicit n_forms works on a bare (attribute-less) form map too
    sc.setJobGroup("edgeplan2", "explicit count must also be job-free")
    try:
        normalize_edges(t, fm.select(fm.columns), spark, n_forms=2)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("edgeplan2")) == []
    assert edges.count() == 1
