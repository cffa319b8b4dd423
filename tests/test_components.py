"""Connected components (large-star/small-star) vs a pure-python oracle."""

import random

from pyspark.sql import functions as F

from legal_knowledge_graph_spark.operators.components import connected_components


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue  # self-loops carry no merge info (contract: absent)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for v in list(parent):
        comp[v] = find(v)
    return comp


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    want = _uf_oracle(edges)
    # same partition AND same min-id labels
    assert got == want


def test_simple_chain(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])


def test_star_and_selfloops(spark):
    _check(spark, [(5, 1), (5, 2), (5, 3), (7, 7), (8, 9), (9, 8)])


def test_random_graphs(spark):
    rng = random.Random(7)
    for n, m in [(30, 25), (50, 80)]:
        edges = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_giant_component(spark):
    # a long path: worst case for min-propagation, fine for star rounds
    edges = [(i, i + 1) for i in range(60)]
    _check(spark, edges)


def test_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
