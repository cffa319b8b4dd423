"""Shared helpers for the bench_* harnesses."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fingerprint_all_cols(df: DataFrame) -> tuple[int, int]:
    """(rows, order-insensitive XOR fingerprint over ALL columns) — the
    cross-parallelism identical-output check. One aggregate job."""
    r = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("fp")).collect()[0]
    return int(r.rows), int(r.fp)
