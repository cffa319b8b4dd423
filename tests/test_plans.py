"""Physical-plan regression gates for the dedup pair generators
(VERDICT r2 #8): candidate stages must stay equi-joins on blocking keys
(no nested-loop/cartesian) with the designed shuffle count — an Exchange
regression means a blocking key or pre-aggregation was lost."""

import io
import re
from contextlib import redirect_stdout

import pytest

from legal_knowledge_graph_spark.operators.dedup import (
    minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_dup_pairs,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# r6: caps re-baselined for the widening repartitions (partitioning
# module) — REPARTITION exchanges print once per subtree reference but
# are reused at runtime (ReusedExchange); cartesian/nested-loop stay
# forbidden outright.
@pytest.mark.parametrize("builder,max_exchanges", [
    (lambda d: ngram_jaccard_pairs(d, threshold=0.5), 14),
    (lambda d: minhash_lsh_pairs(d, threshold=0.5), 24),
    (lambda d: simhash_near_dup_pairs(d, max_hamming=3), 16),
], ids=["ngram_jaccard", "minhash_lsh", "simhash"])
def test_dedup_pair_generator_plans(spark, docs, builder, max_exchanges):
    plan = _plan(builder(docs))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert _n_exchanges(plan) <= max_exchanges


def test_boilerplate_plan(spark, docs):
    """remove_boilerplate under the broadcast threshold: the anti-join on
    the (observed-small) boilerplate set must broadcast — no line-keyed
    repartition of the fat side beyond the counting agg — and never go
    nested-loop. The boiler subtree is checkpointed (the size probe rides
    it), so its scalar-attach shape is gated separately below."""
    from legal_knowledge_graph_spark.operators.text_analysis import (
        remove_boilerplate,
    )

    plan = _plan(remove_boilerplate(docs, min_docs=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin LeftAnti" in plan  # boiler anti-join map-side


def test_boilerplate_lines_plan(spark, docs):
    """boilerplate_lines: the ONLY nested-loop join allowed is the scalar
    corpus-count attach — a broadcast cross join whose build side is the
    1-row global aggregate."""
    from legal_knowledge_graph_spark.operators.text_analysis import (
        boilerplate_lines,
    )

    plan = _plan(boilerplate_lines(docs, min_docs=2))
    assert "CartesianProduct" not in plan
    bnlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj) <= 1
    if bnlj:
        assert "greatest(" in plan and "_n_docs" in plan


def test_boilerplate_over_threshold_shape_and_equality(spark, docs):
    """Forcing the over-threshold path (broadcast_max=0): the anti-join
    must NOT broadcast a corpus-growing boilerplate table (VERDICT r3 #1)
    — and the output must be byte-identical to the broadcast path."""
    from legal_knowledge_graph_spark.operators.text_analysis import (
        remove_boilerplate,
    )

    from pyspark.sql import functions as F

    small = docs.where("doc_id < 60").select(
        "doc_id",
        F.concat(F.lit("=== SHARED HEADER ===\n"), "text",
                 F.lit("\nshared footer line")).alias("text"))
    # over threshold the hint is omitted — Catalyst is then free to pick
    # by STATISTICS (it still auto-broadcasts the small test-scale table,
    # which is right); pinning autoBroadcastJoinThreshold=-1 proves no
    # forced broadcast survives, i.e. a huge boiler table shuffles
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffled = remove_boilerplate(small, min_docs=2, broadcast_max=0)
        assert "BroadcastHashJoin LeftAnti" not in _plan(shuffled)
        a = sorted(map(tuple, shuffled.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    broadcasted = remove_boilerplate(small, min_docs=2)
    assert "BroadcastHashJoin LeftAnti" in _plan(broadcasted)
    b = sorted(map(tuple, broadcasted.collect()))
    assert a == b and len(a) == small.count()


def test_contamination_plan(spark, docs):
    """benchmark_contamination: the benchmark meet must be a LEFT SEMI
    equi-join on the shingle (no expansion, no nested loop)."""
    from legal_knowledge_graph_spark.operators.dedup import (
        benchmark_contamination,
    )

    plan = _plan(benchmark_contamination(
        docs, docs.where("doc_id % 20 = 0"), threshold=0.5))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_zorder_key_closed_form_and_layout(spark):
    from pyspark.sql import functions as F

    from legal_knowledge_graph_spark.operators.layout import (
        repartition_zorder, zorder_key,
    )

    # closed form: interleave bits of small known values
    def morton2(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long")
    got = {(r.x, r.y): r.z for r in df.select(
        "x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    for (x, y), z in got.items():
        assert z == morton2(x, y)
    # locality: the z-curve visits each 2x2 quad contiguously
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1
    assert got[(0, 1)] == 2 and got[(1, 1)] == 3

    # layout contract: range partitions hold contiguous, non-overlapping
    # zkey ranges and rows are sorted within each partition
    big = spark.createDataFrame(
        [(i * 37 % 1024, i * 91 % 1024) for i in range(4000)],
        "x long, y long")
    parts = (
        repartition_zorder(big, ["x", "y"], n_partitions=8)
        .select(F.spark_partition_id().alias("pid"), "zkey")
        .groupBy("pid")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("lo")
        .collect()
    )
    assert sum(p.n for p in parts) == 4000 and len(parts) > 1
    for a, b in zip(parts, parts[1:]):
        assert a.hi <= b.lo  # non-overlapping ascending ranges
    plan = repartition_zorder(big, ["x", "y"], 8)._jdf \
        .queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
