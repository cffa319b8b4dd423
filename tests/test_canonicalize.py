"""st3 unit tests: dictionary join, merge rules, representative selection,
LSH/token-blocking equivalence."""

import pytest
from pyspark.sql import functions as F

from legal_knowledge_graph_spark.operators.canonicalize import canonicalize
from legal_knowledge_graph_spark.schema import MENTIONS_SCHEMA


def _mentions_df(spark, rows):
    """rows: (entity_type, text) -> minimal mentions frame."""
    full = [
        ("dk", "r", "p", "sha", f"b{i}", "FUNCTION", f"m{i}", t, x, 0, len(x),
         0.9, False, None, {})
        for i, (t, x) in enumerate(rows)
    ]
    return spark.createDataFrame(full, MENTIONS_SCHEMA)


@pytest.fixture(scope="module", params=[False, True], ids=["blocking", "lsh"])
def use_lsh(request):
    return request.param


def _nodes(spark, rows, use_lsh):
    m = _mentions_df(spark, rows)
    nodes, form_map = canonicalize(m, spark, use_lsh=use_lsh)
    return ({(r.entity_type, r.canonical_name): r for r in nodes.collect()},
            {(r.entity_type, r.text): r.canonical_name for r in form_map.collect()})


def test_dictionary_unifies_by_name(spark, use_lsh):
    nodes, fm = _nodes(spark, [
        ("License", "MIT"), ("License", "MIT License"),
        ("License", "Apache-2.0"), ("License", "Apache License 2.0"),
    ], use_lsh)
    assert set(nodes) == {("License", "MIT License"),
                          ("License", "Apache License 2.0")}
    assert fm[("License", "MIT")] == "MIT License"
    assert fm[("License", "Apache-2.0")] == "Apache License 2.0"


def test_containment_merges_longest_wins(spark, use_lsh):
    nodes, fm = _nodes(spark, [
        ("Author", "Alice Johnson"), ("Author", "Dr. Alice Johnson"),
        ("Author", "Bob Lee"),
    ], use_lsh)
    assert ("Author", "Dr. Alice Johnson") in nodes
    assert ("Author", "Bob Lee") in nodes
    assert fm[("Author", "Alice Johnson")] == "Dr. Alice Johnson"
    node = nodes[("Author", "Dr. Alice Johnson")]
    assert node.aliases == ["Alice Johnson"]
    assert node.n_mentions == 2


def test_no_cross_type_merge(spark, use_lsh):
    nodes, _ = _nodes(spark, [
        ("Function", "parse_config"), ("Class", "parse_config"),
    ], use_lsh)
    assert len(nodes) == 2


def test_structural_types_identity(spark, use_lsh):
    # Files share most path tokens; they must never similarity-merge
    nodes, _ = _nodes(spark, [
        ("File", "org/r/src/parse_config.py"),
        ("File", "org/r/src/load_config.py"),
    ], use_lsh)
    assert len(nodes) == 2


def test_confidence_formula(spark, use_lsh):
    # dict-matched cluster: min(0.9, 0.7 + 0.2 * frac)  (normalizer.py:279-305)
    nodes, _ = _nodes(spark, [("License", "MIT"), ("License", "MIT")], use_lsh)
    node = nodes[("License", "MIT License")]
    assert abs(node.confidence - 0.9) < 1e-9
    # non-dict singleton: 0.5 + 0.3 * min(1, 1/3)
    nodes2, _ = _nodes(spark, [("Function", "parse_config")], use_lsh)
    n2 = nodes2[("Function", "parse_config")]
    assert abs(n2.confidence - 0.6) < 1e-9


def test_entity_id_content_derived(spark, use_lsh):
    nodes, _ = _nodes(spark, [("Function", "parse_config")], use_lsh)
    again, _ = _nodes(spark, [("Function", "parse_config")], use_lsh)
    k = ("Function", "parse_config")
    assert nodes[k].entity_id == again[k].entity_id


def test_lsh_and_blocking_agree(spark):
    rows = [
        ("License", "MIT"), ("License", "The MIT License"),
        ("Author", "John Smith"), ("Author", "John A. Smith"),
        ("Module", "numpy"), ("Module", "numpy.core"), ("Module", "os"),
        ("Function", "parse_config"), ("Function", "utils.parse_config"),
        ("Date", "2024"), ("Date", "2024-06-01"),
    ]
    a, _ = _nodes(spark, rows, use_lsh=False)
    b, _ = _nodes(spark, rows, use_lsh=True)
    assert set(a) == set(b)
