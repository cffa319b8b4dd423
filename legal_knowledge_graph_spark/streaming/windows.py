"""Watermarked windowed aggregation over an event stream (SURVEY §2.8 /
task brief: "watermarks + windowed aggs for late data").

`windowed_event_counts` lifts the batch events_hourly aggregation to
Structured Streaming: event-time tumbling windows with a watermark that
bounds state (late rows beyond the watermark are dropped, on-time rows
aggregate exactly once). Drained with Trigger.AvailableNow the result
equals the batch aggregation over the same input — asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours",
) -> DataFrame:
    """event stream -> (window_start, event_type, n, sum_value). The
    watermark bounds aggregation state: at 100 TB/day the state store
    holds only the trailing `watermark` of windows per type, not history."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "sum_value")
    )


def run_windowed_events(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    window: str = "1 hour", watermark: str = "2 hours",
):
    """Drain available event files through the watermarked windowed agg
    into a parquet sink (append mode: a window is emitted once, when the
    watermark passes it; AvailableNow closes all windows at drain end)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    q = (
        windowed_event_counts(stream, window, watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
