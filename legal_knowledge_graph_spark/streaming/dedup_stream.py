"""Streaming exact deduplication: keep the first-arriving copy of every
distinct (normalized) document content across an unbounded stream.

The batch twin is `operators/dedup.exact_duplicates` (same normalized-md5
fingerprint, oracled by doc_exact_dedup); here the fingerprint feeds
Structured Streaming's stateful `dropDuplicates`, so a document whose
content already flowed past — in ANY earlier micro-batch — is dropped
exactly once, under the streaming checkpoint's exactly-once contract.

State shape at scale: one state-store entry per DISTINCT fingerprint
(16-byte key, no payload) — the minimum any exact-dedup can hold; backed
by the RocksDB state store on a real cluster. Exact corpus dedup is
inherently unbounded-state (any future doc may duplicate any past doc);
when bounded lateness is acceptable, pass `within_watermark` (event-time
column + delay) to switch to `dropDuplicatesWithinWatermark`, which
expires state past the horizon."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fingerprint(text_col: str):
    # byte-for-byte text_analysis.fingerprints / dedup.exact_duplicates
    return F.md5(F.regexp_replace(
        F.lower(F.trim(F.col(text_col))), r"\s+", " "))


def streaming_exact_dedup(
    stream: DataFrame, text_col: str = "text",
    within_watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """streaming docs -> first-seen rows only, with their fingerprint."""
    out = stream.withColumn("fingerprint", _fingerprint(text_col))
    if within_watermark is not None:
        ts_col, delay = within_watermark
        return out.withWatermark(ts_col, delay) \
            .dropDuplicatesWithinWatermark(["fingerprint"])
    return out.dropDuplicates(["fingerprint"])


def run_streaming_dedup(
    spark: SparkSession, input_dir: str, output_dir: str,
    checkpoint_dir: str, schema, text_col: str = "text",
    max_files_per_trigger: int = 8,
):
    """Drain currently-available input (Trigger.AvailableNow) through the
    stateful dedup into a parquet table; exactly-once via the streaming
    checkpoint (a re-drain with the same checkpoint is a no-op, and new
    batches dedup against ALL previously-seen state)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    q = (
        streaming_exact_dedup(stream, text_col)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
