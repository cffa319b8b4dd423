"""Deterministic mergeable sketches for cardinality profiling.

KMV (k-minimum-values) distinct counting [Bar-Yossef et al. 2002]: hash
every value uniformly into [0, 2^32); the k-th smallest hash h_(k) of a
set with d distinct values concentrates around k/d * 2^32, so

    est = (k - 1) * 2^32 / h_(k)        (unbiased for uniform hashes)

Unlike HyperLogLog the sketch is just "the k smallest hashes" — trivially
mergeable (union, keep smallest k), and with a FIXED hash (md5-derived,
sampling._hash32 scheme) the estimate is bit-deterministic across engines,
which is what lets the driver hold it to an exact SQL oracle instead of a
tolerance band. The reference has no cardinality profiling at all; its
stats are exact counts (/root/reference/src/neo4j/models.py:100-159).

Scale shape (100 TB): values collapse to DISTINCT (group, hash) pairs
map-side; the k smallest per group are chosen by the salted two-phase
top-k (exact_k_per_stratum discipline) so no group — however hot — ever
sorts in one task. Output is one row per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import HASH_SPACE, _hash32


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64,
    seed: int = 0, exact: bool = True,
) -> DataFrame:
    """Per-group approximate distinct count via a k-minimum-values
    sketch; `exact=True` also attaches the true distinct count (one
    extra aggregate over the same pair table) so callers — and tests —
    can read the error directly. Groups with fewer than k distinct
    values report their EXACT cardinality (every hash is in the sketch:
    the standard small-set fallback). Estimates round to 6 places."""
    from .sampling import salted_smallest_k

    pairs = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("string").alias("_v")) \
        .dropDuplicates(["grp", "_v"]) \
        .withColumn("_h", _hash32("_v", seed))
    # distinct VALUES can still collide in the 32-bit hash space; the
    # sketch is defined over distinct hashes, so collapse again on the
    # hash before ranking (both engines see the identical hash set)
    hashes = pairs.select("grp", "_h").dropDuplicates(["grp", "_h"])
    kept = salted_smallest_k(hashes, ["grp"], "_h", k)
    sk = kept.groupBy("grp").agg(
        F.count(F.lit(1)).alias("_n_in_sketch"),
        F.max("_h").alias("_hk"))
    est = F.when(
        F.col("_n_in_sketch") < k, F.col("_n_in_sketch").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)))
                / F.col("_hk"))
    out = sk.select("grp", F.round(est, 6).alias("est_distinct"))
    if exact:
        ex = pairs.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n_distinct"))
        out = out.join(ex, "grp")
    return out.withColumnRenamed("grp", group_col)


def kmv_rolling_distinct(
    events: DataFrame, group_ts_col: str = "ts",
    value_col: str = "user_id", window_hours: int = 24, k: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Rolling distinct-count estimates from MERGED per-hour KMV
    sketches — the property that makes KMV the 100 TB shape: each hour
    keeps only its k smallest hashes (a k-element array), and any time
    window's sketch is the k smallest of the UNION of its hours'
    sketches (the k smallest of a union are always among the parts' k
    smallest), so the trailing-24h estimate never re-touches raw
    events. Output (hour, est_distinct) for every observed hour, over
    the trailing `window_hours` OBSERVED rows including the current.

    Scale shape: raw events collapse to distinct (hour, hash) pairs
    map-side; per-hour sketch arrays come from the same salted
    two-phase smallest-k as kmv_distinct; the rolling merge is a window
    over the tiny hours table using pure Catalyst array ops (flatten ->
    array_distinct -> array_sort -> slice) on k-bounded arrays."""
    from pyspark.sql.window import Window

    from .sampling import salted_smallest_k

    hour = F.date_trunc("hour", F.col(group_ts_col)).alias("hour")
    pairs = events.select(
        hour, F.col(value_col).cast("string").alias("_v")) \
        .dropDuplicates(["hour", "_v"]) \
        .withColumn("_h", _hash32("_v", seed)) \
        .select("hour", "_h").dropDuplicates(["hour", "_h"])
    kept = salted_smallest_k(pairs, ["hour"], "_h", k)
    sketches = kept.groupBy("hour").agg(
        F.array_sort(F.collect_list("_h")).alias("_sk"))
    wr = Window.orderBy("hour").rowsBetween(-(window_hours - 1), 0)
    merged = F.slice(
        F.array_sort(F.array_distinct(
            F.flatten(F.collect_list("_sk").over(wr)))), 1, k)
    rolled = sketches.select(
        "hour", merged.alias("_m"),
        F.size(merged).alias("_n"))
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)))
                / F.element_at("_m", k))
    return rolled.select("hour", F.round(est, 6).alias("est_distinct"))
