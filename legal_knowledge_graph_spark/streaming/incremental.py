"""Structured-Streaming incremental extraction (stateless stage prefix)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.ingest import ingest
from ..operators.mentions import mentions_from_files
from ..schema import FILES_SCHEMA


def incremental_mentions(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a landing directory of parquet `files` batches ->
    streaming mentions DataFrame (st0 -> fused st1+st2; both stateless,
    so they lift to streaming unchanged)."""
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    return mentions_from_files(ingest(stream))


def run_incremental(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    await_termination: bool = True,
):
    """Drain currently-available input (Trigger.AvailableNow) into the
    mentions stage table; exactly-once via the streaming checkpoint. The
    stateful suffix (st3+) re-runs as batch over the table afterwards."""
    q = (
        incremental_mentions(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
