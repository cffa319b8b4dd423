"""Temporal join operators: as-of join (sort-merge window shape) and
point-in-interval range join (equi-bucket shape), plus the DSIR
importance-weight operator that rides the same deterministic hash."""

import hashlib
import io
import math
import re
from contextlib import redirect_stdout
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from legal_knowledge_graph_spark.operators.sampling import importance_weights
from legal_knowledge_graph_spark.operators.temporal import (
    asof_join, point_in_interval_join)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01T10:00:00"), 5.0),
         (1, 101, _ts("2024-01-01T10:05:00"), 6.0),
         (2, 102, _ts("2024-01-01T09:00:00"), 7.0),   # before any right
         (3, 103, _ts("2024-01-01T12:00:00"), 8.0)],  # user with no right
        "user_id long, event_id long, ts timestamp, value double")
    right = spark.createDataFrame(
        [(1, 900, _ts("2024-01-01T10:00:00"), 1.0),   # equal-ts: inclusive
         (1, 901, _ts("2024-01-01T10:00:00"), 2.0),   # tie -> larger id
         (1, 902, _ts("2024-01-01T10:04:00"), 3.0),
         (2, 903, _ts("2024-01-01T09:30:00"), 4.0)],
        "user_id long, event_id long, ts timestamp, value double")
    return left, right


def test_asof_semantics(spark, asof_frames):
    """Backward-inclusive match, largest-tie_col tie-break at equal right
    ts, NULL struct when no right row is at-or-before the left row."""
    left, right = asof_frames
    out = asof_join(left, right, ["user_id"], tie_col="event_id",
                    right_payload=["event_id", "value"])
    got = {r.event_id: (r.matched.event_id if r.matched else None)
           for r in out.collect()}
    assert got == {
        100: 901,   # equal ts is a match; tie 900/901 -> larger id
        101: 902,   # most recent strictly-before
        102: None,  # right rows exist but all later
        103: None,  # no right rows for the user at all
    }
    # left payload survives untouched
    vals = {r.event_id: r.value for r in out.collect()}
    assert vals == {100: 5.0, 101: 6.0, 102: 7.0, 103: 8.0}


def test_asof_plan_is_single_shuffle_no_join(spark, asof_frames):
    """The whole operator is union + window: exactly one Exchange on the
    key and NO join node of any kind — that is the 100 TB contract."""
    left, right = asof_frames
    plan = _plan(asof_join(left, right, ["user_id"], tie_col="event_id"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan  # no SortMergeJoin/BroadcastHashJoin/BNLJ


def test_point_in_interval_join_boundaries(spark):
    """Half-open [start, end): start inclusive, end exclusive; intervals
    spanning multiple buckets still match each point exactly once."""
    points = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00")),
         (1, 11, _ts("2024-01-01T10:09:59")),
         (1, 12, _ts("2024-01-01T10:10:00")),    # == end -> excluded
         (1, 13, _ts("2024-01-01T09:59:59")),    # < start -> excluded
         (2, 14, _ts("2024-01-01T10:05:00"))],   # other key
        "user_id long, pid long, p_ts timestamp")
    intervals = spark.createDataFrame(
        [(1, 77, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:10:00"))],
        "user_id long, iid long, start timestamp, end timestamp")
    out = point_in_interval_join(
        points, intervals, ["user_id"], point_ts="p_ts",
        bucket_width_s=60)  # interval spans 10 buckets of 60 s
    rows = sorted((r.pid, r.iid) for r in out.collect())
    assert rows == [(10, 77), (11, 77)]
    # exactly-once even though the interval covers many buckets
    assert out.count() == out.dropDuplicates(["pid", "iid"]).count()


def test_point_in_interval_plan_is_equi_join(spark):
    # keys/timestamps must derive from data: literal keys constant-fold
    # the equi predicate away and any join degenerates to BNLJ
    points = spark.range(10).select(
        (F.col("id") % 3).alias("user_id"), F.col("id").alias("pid"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60)
        .alias("p_ts"))
    intervals = spark.range(3).select(
        F.col("id").alias("user_id"), F.col("id").alias("iid"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 120)
        .alias("start"),
        F.timestamp_seconds(F.lit(1700000600) + F.col("id") * 120)
        .alias("end"))
    plan = _plan(point_in_interval_join(
        points, intervals, ["user_id"], point_ts="p_ts"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _h32(word: str, seed: int = 9) -> int:
    return int(hashlib.md5(f"{word}:{seed}".encode()).hexdigest()[:8], 16)


def test_importance_weights_tiny_fixture(spark):
    """Hand-computed DSIR weights on a 3-doc corpus: target docs score
    higher than the off-target doc, and the exact value matches the
    Laplace-smoothed log-ratio computed independently in python."""
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha", "en"),
         (2, "alpha beta", "en"),
         (3, "gamma gamma delta", "de")],
        "doc_id long, text string, lang string")
    B = 64
    out = {r.doc_id: (r.n_tokens, r.importance)
           for r in importance_weights(
               docs, F.col("lang") == "en", n_buckets=B).collect()}
    # independent python model
    toks = {1: ["alpha", "beta", "alpha"], 2: ["alpha", "beta"],
            3: ["gamma", "gamma", "delta"]}
    target = {1, 2}
    n_t, n_r = {}, {}
    for d, ws in toks.items():
        for w in ws:
            b = _h32(w) % B
            n_r[b] = n_r.get(b, 0) + 1
            if d in target:
                n_t[b] = n_t.get(b, 0) + 1
    tt, tr = sum(n_t.values()), sum(n_r.values())
    def lr(b):
        return (math.log((n_t.get(b, 0) + 1.0) / (tt + B))
                - math.log((n_r.get(b, 0) + 1.0) / (tr + B)))
    for d, ws in toks.items():
        exp = round(sum(lr(_h32(w) % B) for w in ws) / len(ws), 6)
        assert out[d] == (len(ws), pytest.approx(exp, abs=1e-6)), d
    # in-domain docs outrank the off-target doc
    assert min(out[1][1], out[2][1]) > out[3][1]


@pytest.mark.parametrize("width", [1, 60, 3600])
def test_asof_chunked_equals_single_window(spark, asof_frames, width):
    """The chunked scale path is output-identical to the single-window
    path at any chunk width (including width=1 s, where nearly every row
    sits alone in its chunk and all matching flows through the seeds)."""
    left, right = asof_frames
    base = asof_join(left, right, ["user_id"], tie_col="event_id",
                     right_payload=["event_id", "value"])
    chunked = asof_join(left, right, ["user_id"], tie_col="event_id",
                        right_payload=["event_id", "value"],
                        chunk_width_s=width)
    key = lambda r: r.event_id
    a = sorted(((r.event_id, r.value,
                 r.matched.event_id if r.matched else None)
                for r in base.collect()))
    b = sorted(((r.event_id, r.value,
                 r.matched.event_id if r.matched else None)
                for r in chunked.collect()))
    assert a == b


def test_asof_chunked_random_stream(spark):
    """Randomized 2k-row stream (hash-derived, deterministic): chunked
    and single-window paths agree row-for-row, including tie-breaks
    (timestamps collide by construction: 50 distinct seconds)."""
    ev = spark.range(2000).select(
        F.col("id").alias("event_id"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 5).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + F.abs(F.xxhash64("id", F.lit(2))) % 50).alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(3))) % 2).alias("side"))
    left = ev.where(F.col("side") == 0).drop("side")
    right = ev.where(F.col("side") == 1).drop("side")

    def run(**kw):
        out = asof_join(left, right, ["user_id"], tie_col="event_id",
                        right_payload=["event_id"], **kw)
        return sorted((r.event_id,
                       r.matched.event_id if r.matched else None)
                      for r in out.collect())

    base = run()
    assert base == run(chunk_width_s=7)
    assert base == run(chunk_width_s=1)
    # hybrid: threshold routes some keys hot, some cold (5 keys x ~200
    # rows each; threshold 150 puts most keys hot, 10**6 none)
    assert base == run(chunk_width_s=7, hot_key_threshold=150)
    assert base == run(chunk_width_s=7, hot_key_threshold=10**6)


@pytest.mark.parametrize("width", [1, 7, 3600])
def test_interval_overlap_join_vs_bruteforce(spark, width):
    """Bucketed overlap join equals the brute-force theta join at any
    bucket width; empty intervals match nothing; pairs sharing many
    buckets appear exactly once."""
    from legal_knowledge_graph_spark.operators.temporal import (
        interval_overlap_join,
    )

    base = 1_700_000_000
    iv = spark.range(300).select(
        F.col("id").alias("lid"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 4).alias("key"),
        F.timestamp_seconds(
            base + F.abs(F.xxhash64("id", F.lit(2))) % 120).alias("s1"),
        F.timestamp_seconds(
            base + F.abs(F.xxhash64("id", F.lit(2))) % 120
            + F.abs(F.xxhash64("id", F.lit(3))) % 40
            - 2).alias("e1"))  # some empty/negative-length intervals
    rv = spark.range(300).select(
        (F.col("id") + 1000).alias("rid"),
        (F.abs(F.xxhash64("id", F.lit(4))) % 4).alias("key"),
        F.timestamp_seconds(
            base + F.abs(F.xxhash64("id", F.lit(5))) % 120).alias("s2"),
        F.timestamp_seconds(
            base + F.abs(F.xxhash64("id", F.lit(5))) % 120
            + F.abs(F.xxhash64("id", F.lit(6))) % 40 - 2).alias("e2"))
    got = sorted(
        (r.lid, r.rid) for r in interval_overlap_join(
            iv, rv, ["key"], left_start="s1", left_end="e1",
            right_start="s2", right_end="e2",
            bucket_width_s=width).collect())
    want = sorted(
        (r.lid, r.rid) for r in iv.alias("l").join(
            rv.alias("r"), F.col("l.key") == F.col("r.key")).where(
            F.greatest("s1", "s2") < F.least("e1", "e2")).collect())
    assert got == want and want  # non-trivial fixture
    assert len(got) == len(set(got))  # exactly-once emission


def test_interval_overlap_join_rejects_column_clash(spark):
    from legal_knowledge_graph_spark.operators.temporal import (
        interval_overlap_join,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 2.0)], "key long, start double, end double")
    with pytest.raises(ValueError):
        interval_overlap_join(df, df, ["key"])
