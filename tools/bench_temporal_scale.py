"""Wall-clock evidence that the temporal joins hold 3 orders of
magnitude past the driver queries, WITH a hot key: a deterministic
hash-derived event stream (default 10M events, built on executors)
where ONE user owns ~10% of all events (10^6 rows — far past any
broadcast threshold and the worst case for pair-generating as-of
implementations).

- asof_join: the union+window shape costs the hot user one task's sort
  (10^6 rows), never 10^6 x 10^6 candidate pairs. Wall should scale
  ~linearly in events.
- point_in_interval_join: intervals = a deterministic 1% slice of the
  stream, 1-hour windows; the equi-bucket join bounds fan-out at
  ceil(3600/width)+1 buckets per interval.

Outputs are fingerprinted (order-insensitive XOR of per-row hashes) so
two runs at different parallelism prove identical results:
  python tools/bench_temporal_scale.py 10000000 8
  python tools/bench_temporal_scale.py 10000000 32
Prints one JSON line per run; merged into BENCH/scaling.json as
"temporal_scale".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_USERS = 1_000_000
SPAN_S = 86400 * 30


def build_events(spark, n_events: int, hot_pct: int = 10):
    """hot_pct% of events on user 0 (hot key), the rest uniform;
    timestamps uniform over 30 days; alternating halves play the
    left/right streams. hot_pct=0 is the skew-free control."""
    uid = F.abs(F.xxhash64("id", F.lit(19))) % N_USERS
    if hot_pct:
        uid = F.when(
            F.abs(F.xxhash64("id", F.lit(17))) % 100 < hot_pct,
            F.lit(0)).otherwise(uid)
    return (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            uid.alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.abs(F.xxhash64("id", F.lit(23))) % SPAN_S).alias("ts"),
            (F.abs(F.xxhash64("id", F.lit(29))) % 2).alias("side"))
        .localCheckpoint()
    )


def main() -> None:
    from legal_knowledge_graph_spark.operators.temporal import (
        asof_join, point_in_interval_join)
    from legal_knowledge_graph_spark.session import build_session

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    hot_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = build_session(app_name="lkg-temporal-scale",
                          master=f"local[{cores}]",
                          shuffle_partitions=max(cores, 16))
    ev = build_events(spark, n_events, hot_pct)
    n = ev.count()
    out = {"cores": cores, "n_events": int(n), "hot_pct": hot_pct}

    left = ev.where(F.col("side") == 0).drop("side")
    right = ev.where(F.col("side") == 1).drop("side")

    t0 = time.time()
    aj = asof_join(left, right, ["user_id"], tie_col="event_id",
                   right_payload=["event_id"])
    fp = aj.agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(F.xxhash64("event_id", F.col("matched.event_id")))
        .alias("fp")).collect()[0]
    out["asof"] = {"secs": round(time.time() - t0, 3),
                   "rows": int(fp.rows), "fingerprint": int(fp.fp)}

    # hot-key scale path: keys above 100k rows (here: just user 0 with
    # ~1M) route through daily chunks — ~30 bounded tasks instead of one
    # 1M-row sort — while the uniform majority keeps the single-window
    # shape; fingerprint MUST equal the single-window path
    t0 = time.time()
    ajc = asof_join(left, right, ["user_id"], tie_col="event_id",
                    right_payload=["event_id"], chunk_width_s=86400,
                    hot_key_threshold=100_000)
    fp = ajc.agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(F.xxhash64("event_id", F.col("matched.event_id")))
        .alias("fp")).collect()[0]
    out["asof_hybrid_1d"] = {"secs": round(time.time() - t0, 3),
                              "rows": int(fp.rows),
                              "fingerprint": int(fp.fp)}

    ivals = right.where(F.abs(F.xxhash64("event_id", F.lit(31))) % 100 == 0) \
        .select(F.col("event_id").alias("iid"), "user_id",
                F.col("ts").alias("start"),
                (F.col("ts") + F.expr("interval 1 hour")).alias("end"))
    t0 = time.time()
    rj = point_in_interval_join(
        left.select("user_id", F.col("event_id").alias("pid"),
                    F.col("ts").alias("p_ts")),
        ivals, ["user_id"], point_ts="p_ts", bucket_width_s=3600)
    fp = rj.agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(F.xxhash64("pid", "iid")).alias("fp")).collect()[0]
    out["range_join"] = {"secs": round(time.time() - t0, 3),
                         "rows": int(fp.rows), "fingerprint": int(fp.fp)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
