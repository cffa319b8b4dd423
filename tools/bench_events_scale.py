"""Wall-clock evidence the new event analytics hold far past the driver
queries, WITH a hot key: a deterministic hash-derived stream (default
10M events) where ONE bot user owns ~10% of all events — the worst case
for per-user sequence windows.

- markov_transitions: plain path gives the bot a single-task 10^6-row
  window sort; the chunked path (chunk_width_s=1 day) bounds every task
  at one (user, day) and stitches boundaries — fingerprints MUST match.
- rolling_anomaly: collapses the stream to (type, hour) counts in one
  map-side aggregate; the window runs over the tiny hourly table.

Run at two parallelism levels for the scaling pair:
  python tools/bench_events_scale.py 10000000 8
  python tools/bench_events_scale.py 10000000 32
Prints one JSON line per run; merged into BENCH/scaling.json as
"events_scale".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

N_USERS = 1_000_000
SPAN_S = 86400 * 30
TYPES = ["view", "click", "purchase", "signup", "error"]


def build_events(spark, n_events: int, hot_pct: int = 10):
    uid = F.abs(F.xxhash64("id", F.lit(19))) % N_USERS
    if hot_pct:
        uid = F.when(
            F.abs(F.xxhash64("id", F.lit(17))) % 100 < hot_pct,
            F.lit(0)).otherwise(uid)
    etype = F.element_at(
        F.array(*[F.lit(t) for t in TYPES]),
        (F.abs(F.xxhash64("id", F.lit(37))) % len(TYPES) + 1).cast("int"))
    return (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            uid.alias("user_id"),
            etype.alias("event_type"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.abs(F.xxhash64("id", F.lit(23))) % SPAN_S).alias("ts"))
        .localCheckpoint()
    )


def _fp(df):
    from benchlib import fingerprint_all_cols
    return fingerprint_all_cols(df)


def main() -> None:
    from legal_knowledge_graph_spark.operators.events_analytics import (
        markov_transitions, rolling_anomaly)
    from legal_knowledge_graph_spark.session import build_session

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    hot_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = build_session(app_name="lkg-events-scale",
                          master=f"local[{cores}]",
                          shuffle_partitions=max(cores, 16))
    ev = build_events(spark, n_events, hot_pct)
    n = ev.count()
    out = {"cores": cores, "n_events": int(n), "hot_pct": hot_pct}

    t0 = time.time()
    rows, fp = _fp(markov_transitions(ev))
    out["markov_plain"] = {"secs": round(time.time() - t0, 3),
                           "rows": rows, "fingerprint": fp}

    t0 = time.time()
    rows, fp = _fp(markov_transitions(ev, chunk_width_s=86400))
    out["markov_chunked_1d"] = {"secs": round(time.time() - t0, 3),
                                "rows": rows, "fingerprint": fp}

    t0 = time.time()
    rows, fp = _fp(rolling_anomaly(ev))
    out["anomaly"] = {"secs": round(time.time() - t0, 3),
                      "rows": rows, "fingerprint": fp}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
