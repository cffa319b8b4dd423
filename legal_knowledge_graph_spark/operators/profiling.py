"""Corpus/statistical profiling operators — the "understand your 100 TB
before training on it" toolkit: equi-depth histograms, pairwise Pearson
correlation, and categorical mutual information. All exact, all
deterministic, all one-or-two aggregates over the raw table.

The reference reports only fixed counters (pipeline/QA summaries,
/root/reference/src/neo4j/models.py:100-159); distribution-level
profiling is what a data engineer actually asks of a corpus first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def equidepth_bins(
    df: DataFrame, col: str, n_bins: int = 10, id_col: str = "doc_id",
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: rows ranked by
    (value, id) — a total order, so bins are deterministic — split into
    `n_bins` ntile buckets; emits per-bin (bin, n, lo, hi, mean).
    Exact, unlike approx_percentile sketches, at the cost of one global
    sort-shuffle of a SLIM (value, id) projection — the standard
    trade when the histogram must be reproducible (ntile's "earlier
    buckets one row larger" rule is shared by every SQL engine).

    Scale shape: the ntile window is a single ordered partition over
    (value, id) pairs only — acceptable for profiling runs; sustained
    100 TB pipelines would bucket by range boundaries from a first
    aggregate pass instead (see layout.repartition_zorder for the
    range-partition machinery)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("v").asc(), F.col("i").asc())
    binned = df.select(F.col(col).alias("v"), F.col(id_col).alias("i")) \
        .withColumn("bin", F.ntile(n_bins).over(w))
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("v").alias("lo"), F.max("v").alias("hi"),
             F.round(F.avg("v"), 6).alias("mean"))
        .select("bin", "n", "lo", "hi", "mean")
    )


def numeric_corr(df: DataFrame, cols: list) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns, long-form
    (col_a, col_b, corr) for a < b. One aggregate row computes every
    pair (map-side combinable moments), then unpivots — the table is
    scanned once regardless of how many pairs."""
    aggs = []
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.round(F.corr(a, b), 6).alias(f"{a}__X__{b}"))
    row = df.agg(*aggs)
    stacked = F.explode(F.array(*[
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 F.col(f"{a}__X__{b}").alias("corr"))
        for a, b in pairs]))
    return row.select(stacked.alias("s")).select("s.*")


def mutual_information(
    df: DataFrame, col_x: str, col_y: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns:

        MI = sum_xy p(x,y) * ln( p(x,y) / (p(x) p(y)) )

    plus the normalized variant MI / min(H(x), H(y)) in [0, 1]. Exact
    from the joint-count table; deterministic. Output one row
    (mi, nmi, n_x, n_y).

    Scale shape: ONE map-side-combining (x, y) count aggregate bounds
    everything downstream by |X| x |Y|; marginals and entropies come
    from window sums over that tiny table, never the raw rows."""
    from pyspark.sql.window import Window

    joint = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")) \
        .agg(F.count(F.lit(1)).alias("nxy"))
    tot = Window.partitionBy()
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    n = F.sum("nxy").over(tot)
    pxy = F.col("nxy") / n
    px = F.sum("nxy").over(wx) / n
    py = F.sum("nxy").over(wy) / n
    terms = joint.select(
        "x", "y", pxy.alias("pxy"), px.alias("px"), py.alias("py"))
    mi = F.sum(F.col("pxy") * F.log(F.col("pxy")
                                    / (F.col("px") * F.col("py"))))
    hx = -F.sum(F.when(F.col("_rx") == 1, F.col("px") * F.log("px")))
    hy = -F.sum(F.when(F.col("_ry") == 1, F.col("py") * F.log("py")))
    ranked = terms.withColumn(
        "_rx", F.row_number().over(
            Window.partitionBy("x").orderBy("y"))).withColumn(
        "_ry", F.row_number().over(
            Window.partitionBy("y").orderBy("x")))
    out = ranked.agg(
        F.round(mi, 6).alias("mi"),
        F.round(mi / F.least(hx, hy), 6).alias("nmi"),
        F.countDistinct("x").alias("n_x"),
        F.countDistinct("y").alias("n_y"))
    return out
