"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the dominant cost of a multi-dimensional selective query
(`WHERE a BETWEEN .. AND b BETWEEN ..`) is how many files the scan must
open. Range-partitioning and sorting by an interleaved-bit Z-order key
co-locates rows that are close in EVERY keyed dimension, so min/max
file statistics prune files on either predicate — the technique behind
Delta/Iceberg OPTIMIZE ZORDER, expressed here as plain DataFrame ops:
a pure-Catalyst bit-interleave expression + repartitionByRange + a
within-partition sort. No data moves twice: one range shuffle, one
local sort, both whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list, bits: int = 16) -> Column:
    """Morton interleave of the low `bits` bits of each input column
    (non-negative ints; values are masked to `bits` bits first). With
    two columns the result is the classic z-curve index: bit i of col 0
    lands at output bit i*n_cols, bit i of col 1 at i*n_cols + 1, ...
    Pure arithmetic — foldable, codegen-friendly, deterministic.

    CONTRACT NOTE (ADVICE r5): the non-negative-int contract is NOT
    enforced here — a negative value's two's-complement low bits mask
    to the TOP of the dimension's range, silently destroying clustering
    locality for those rows (the key stays valid and deterministic, the
    layout just degrades). Shift negative-capable dimensions into
    non-negative range (e.g. col - min) before keying; enforcement is
    left to callers because a per-row guard would put a branch in the
    innermost repartition_zorder expression."""
    n = len(cols)
    if n * bits > 63:
        # shift n*bits-1 would reach the long sign bit (negative keys
        # sort FIRST, silently breaking the curve) or wrap mod 64
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} key bits "
            "> 63 (long sign bit); lower `bits` or drop columns")
    mask = (1 << bits) - 1
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = F.col(c).cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            bit = F.shiftright(x, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def repartition_zorder(
    df: DataFrame, cols: list, n_partitions: int, bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster `df` for multi-dimensional pruning: attach the Z-order
    key, range-partition on it (contiguous, non-overlapping key ranges
    per output file — pytest-pinned), and sort within partitions so
    min/max stats are tight. Writers then emit one file per partition
    whose footer stats prune on ANY of the keyed columns."""
    return (
        df.withColumn(key_col, zorder_key(cols, bits))
        .repartitionByRange(n_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
    )
