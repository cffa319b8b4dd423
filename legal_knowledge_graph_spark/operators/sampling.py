"""Deterministic sampling / data-mixing operators for training pipelines.

Data mixing is a first-class pretraining step: given per-stratum target
rates ("keep 100% of books, 10% of web, 1% of logs"), select a
reproducible subset. Both operators are PURE FILTERS / local top-k —
no shuffle for Bernoulli sampling, one partial-agg shuffle for exact-k —
and both are driven by a content-independent deterministic hash
(first 8 md5 hex chars of "id:seed" as a 32-bit integer), so results are
identical at any parallelism, any partitioning, and any engine that can
compute md5 — which is what makes the DuckDB oracle a verbatim
restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_SPACE = 1 << 32


def _hash32(id_col, seed: int):
    """Deterministic uniform 32-bit hash of (id, seed): the first 8 hex
    chars of md5("id:seed"). Engine-portable (Spark conv == DuckDB ::BIGINT
    on the same hex), unlike xxhash64 which DuckDB cannot reproduce."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(":"), F.lit(str(seed)))), 1, 8),
        16, 10).cast("long")


def stratified_sample(
    docs: DataFrame, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, seed: int = 42, id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: a row of stratum s is
    kept iff hash32(id, seed) < fractions.get(s, default) * 2^32.

    Scale shape: a pure filter over the scan — zero shuffle, trivially
    parallel, reproducible under repartitioning (the hash depends only on
    the row id). The closed `fractions` dict compiles to a CASE chain, so
    everything stays in whole-stage codegen."""
    rate = F.lit(float(default_fraction))
    for k in sorted(fractions):
        rate = F.when(F.col(strata_col) == k, F.lit(float(fractions[k]))) \
            .otherwise(rate)
    return docs.where(_hash32(id_col, seed) < rate * F.lit(HASH_SPACE))


def exact_k_per_stratum(
    docs: DataFrame, strata_col: str, k: int, seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by ascending
    deterministic hash (a uniform random draw that every engine and every
    run reproduces). One window per stratum — rank computation shuffles
    on the stratum key; for skewed strata sizes the hash-ordering still
    spills through WindowExec's external sorter rather than buffering."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        _hash32(id_col, seed).asc(), F.col(id_col).asc())
    return (docs.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k).drop("_rk"))
