"""Streaming anomaly detection: the rolling z-score scorer kept fresh
over an event stream (SURVEY §2.8 bonus surface, alongside sessions/
windows/dedup/incremental).

Shape: foreachBatch maintains an HOURLY-COUNT ledger — each micro-batch
collapses to (event_type, hour, n, batch_id) deltas upserted on
(event_type, hour, batch_id), so a replayed batch overwrites its own
delta (exactly-once by idempotence, the incremental.py discipline) and
an hour whose events span micro-batches accumulates one delta row per
batch. The scorer then runs events_analytics.score_hourly_counts — the
IDENTICAL code path the batch operator uses — over the summed ledger
and swaps a versioned output snapshot (`replace_parquet`). Drained with
Trigger.AvailableNow the snapshot equals rolling_anomaly() over the
same input — asserted in tests/test_streaming.py.

Scale shape: state is the hourly ledger (|types| x |hours| x batches —
ledger compaction = the groupBy the scorer already does), never raw
events; each refresh is O(ledger), and the stream pays it per batch
only because anomaly freshness is the point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.events_analytics import hourly_counts, score_hourly_counts
from ..sources.io import read_graph_table, replace_parquet, upsert_parquet
from .windows import EVENTS_SCHEMA


def run_streaming_anomaly(
    spark: SparkSession, input_dir: str, ledger_dir: str, output_dir: str,
    checkpoint_dir: str, lookback: int = 24, min_periods: int = 12,
    z_threshold: float = 3.0, max_files_per_trigger: int = 8,
):
    """Drain available event files; leave the current anomaly scores at
    `output_dir` (read with sources.io.read_graph_table). Blocks until
    drained."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        delta = hourly_counts(batch_df).withColumn(
            "batch_id", F.lit(batch_id))
        ledger = upsert_parquet(
            spark, ledger_dir, delta, ["event_type", "hour", "batch_id"])
        hourly = ledger.groupBy("event_type", "hour") \
            .agg(F.sum("n").alias("n"))
        scored = score_hourly_counts(
            hourly, lookback, min_periods, z_threshold)
        replace_parquet(spark, output_dir, scored)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_anomalies(spark: SparkSession, output_dir: str) -> DataFrame:
    return read_graph_table(spark, output_dir)
