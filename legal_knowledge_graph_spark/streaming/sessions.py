"""Custom stateful streaming operator: event sessionization via
applyInPandasWithState (task brief §streaming: "applyInPandasWithState
for custom stateful operators").

A session is a maximal run of a user's events with inter-event gaps below
`gap`. State per user = ALL intervals the watermark has not sealed yet
(parallel start/last/count arrays). An interval is emitted exactly when
the event-time watermark passes its end + gap — via the data path or an
EventTimeTimeout — so state is bounded by the watermark like a windowed
aggregation, emission order is watermark-correct (no premature close of
earlier late-opened sessions — ADVICE r3), and sessions still open at
drain end are (correctly) not final and not emitted.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", IntegerType(), False),
])

# state: ALL intervals the watermark has not yet sealed, as parallel
# arrays (start_epoch_us, last_epoch_us, n_events) — ADVICE r3: keeping a
# LIST of open intervals (not just the time-wise last) lets
# watermark-admitted late events arriving across micro-batches merge with
# earlier intervals instead of those being closed prematurely. State stays
# bounded by the watermark: an interval leaves state as soon as
# watermark > end + gap, exactly like a windowed aggregation.
STATE_SCHEMA = StructType([
    StructField("starts", ArrayType(LongType()), True),
    StructField("lasts", ArrayType(LongType()), True),
    StructField("ns", ArrayType(IntegerType()), True),
])

GAP_MINUTES = 30


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _ts(us: int):
    return pd.Timestamp(us * 1000)


def sessionize_fn(gap_minutes: int = GAP_MINUTES):
    gap_us = gap_minutes * 60 * 1_000_000

    gap_ms = gap_minutes * 60_000

    def fn(key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        # Interval-merge sessionization over a LIST of open intervals
        # (ADVICE r2 + r3): every open interval and every new event is an
        # interval; sort by start, sweep-merge on gap adjacency, then emit
        # ONLY intervals the watermark has sealed (watermark > end + gap —
        # nothing the stream can still admit could attach to them). The
        # rest stay in state, so two watermark-admitted late events that
        # land in separate micro-batches within gap of each other merge
        # into one session instead of the first closing prematurely.
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        items: list[list] = []
        if state.exists:
            starts, lasts, ns = state.get
            items.extend([s, l, n] for s, l, n in zip(starts, lasts, ns))
        if not state.hasTimedOut:
            for pdf in pdfs:
                items.extend([_us(t), _us(t), 1] for t in pdf["ts"])
        items.sort(key=lambda x: (x[0], x[1]))
        merged: list[list] = []
        for it in items:
            if merged and it[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], it[1])
                merged[-1][2] += it[2]
            else:
                merged.append(it)
        closed = [(user_id, _ts(s), _ts(l), n)
                  for s, l, n in merged if l + gap_us < wm_us]
        keep = [iv for iv in merged if iv[1] + gap_us >= wm_us]
        if keep:
            state.update(([iv[0] for iv in keep], [iv[1] for iv in keep],
                          [iv[2] for iv in keep]))
            # wake once the watermark can seal the EARLIEST kept interval;
            # must sit strictly above the current watermark
            state.setTimeoutTimestamp(
                max(min(iv[1] for iv in keep) // 1000 + gap_ms,
                    wm_us // 1000 + 1))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end",
                             "n_events"])

    return fn


def sessionized(events: DataFrame, gap_minutes: int = GAP_MINUTES,
                watermark: str = "2 hours") -> DataFrame:
    """streaming events -> closed (user_id, session_start, session_end,
    n_events) rows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_fn(gap_minutes), OUTPUT_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout)
    )


def run_sessionize(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    gap_minutes: int = GAP_MINUTES, watermark: str = "2 hours",
    schema: str = ("event_id long, ts timestamp, user_id long, "
                   "event_type string, value double, props string"),
):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    q = (
        sessionized(stream, gap_minutes, watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def sessionize_batch(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Batch oracle for the streaming operator: lag-based session ids
    (pure Catalyst window functions)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = gap_minutes * 60
    # NTZ timestamps don't cast to long directly; go via TIMESTAMP (the
    # session is pinned to UTC, so the epoch values are identical)
    sec = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag("ts").over(w).cast("timestamp").cast("long")
    marked = events.select("user_id", "ts").withColumn(
        "new_sess", (sec - prev > gap).cast("int"))
    sess = marked.withColumn(
        "sess_id", F.sum(F.coalesce("new_sess", F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).cast("int").alias("n_events"))
        .drop("sess_id")
    )
