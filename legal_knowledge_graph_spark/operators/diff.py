"""Snapshot diff / change-data-capture between two table versions.

Given OLD and NEW versions keyed by `key_cols`, emits one row per
changed key: change = 'added' (key only in NEW), 'removed' (only in
OLD), or 'changed' (present in both, any compared column differs under
null-safe equality), with the comma-joined list of differing columns.
Unchanged keys are dropped — at 100 TB the diff IS the product: ship
the delta, not the snapshot.

Scale shape: ONE full-outer equi-join on the key (both sides shuffle
co-partitioned; AQE handles size asymmetry), column comparison is a
pure projection over the joined row — no per-column joins, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_diff(
    old: DataFrame, new: DataFrame, key_cols: list,
    compare_cols: list | None = None,
) -> DataFrame:
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols, *[F.col(c).alias(f"_o_{c}") for c in compare_cols]) \
        .withColumn("_in_o", F.lit(1))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"_n_{c}") for c in compare_cols]) \
        .withColumn("_in_n", F.lit(1))
    j = o.join(n, key_cols, "full_outer")
    # concat_ws skips NULL elements on both engines, so each unchanged
    # column contributes nothing and the list stays ordered by the
    # declared compare_cols order
    diffs = F.concat_ws(",", *[
        F.when(~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c))
        for c in compare_cols])
    change = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(diffs != "", F.lit("changed"))
    )
    return (
        j.select(*key_cols, change.alias("change"),
                 F.when(change == "changed", diffs).otherwise(F.lit(""))
                 .alias("changed_cols"))
        .where(F.col("change").isNotNull())
    )
