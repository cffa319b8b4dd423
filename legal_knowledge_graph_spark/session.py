"""SparkSession factory tuned for the KG-construction workload.

Settings rationale (100 TB mindset, tested at local[*]):

- Arrow on + bounded batch size: every extraction stage is a
  ``mapInPandas`` over Arrow batches; batch size bounds executor memory
  for wide ``content`` rows (files up to ~50 KB mean a 10k-row batch is
  ~500 MB — keep batches small where content is carried).
- AQE on with skew-join handling: mega-repos (FIXTURES.md §1) skew the
  per-repo stages; AQE splits skewed partitions at runtime.
- shuffle.partitions defaults to a small-cluster value; production
  submits override via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch ceiling while `content` is still in-flight. After st2 the
# content column is pruned and default batching is fine.
_ARROW_BATCH = "2048"


def build_session(
    app_name: str = "lkg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores when
    unset) so bench harnesses can pin parallelism; on a real cluster the
    spark-submit master wins and this argument is left None.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # r6: coalescing stays ON — iteration-heavy operators scanning
        # small checkpoints are dominated by per-task fixed cost and
        # need byte-based coalescing (measured: the same 11M-row degree
        # aggregate costs 2.6 s from a 64-partition checkpoint vs 0.8 s
        # from an 8-partition one; a full-suite A/B with coalescing off
        # regressed the whole iterative graph family ~+50 s at sf1.0).
        # Coalescing's one pathology — fan-out joins behind small
        # shuffles coalesced onto a handful of tasks (measured 200 s vs
        # 12 s on the dedup posting self-join) — is fixed at the
        # operator level with partitioning.repartition_wide (an explicit
        # REPARTITION_BY_NUM exchange AQE never coalesces), not by
        # flipping the global default.
        .config("spark.sql.adaptive.coalescePartitions.enabled",
                os.environ.get("SPARK_GRAFT_COALESCE", "true"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", _ARROW_BATCH)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # compress localCheckpoint / cached RDD blocks (lz4). The pipeline
        # materializes wide string rows at every stage boundary (~1 GB at
        # the edges stage on the 24k bench corpus) and is memory-bandwidth
        # bound at high core counts — measured on the scaling corpus:
        # level-32 139.7 -> 117.6 s (-16%), level-8 261.1 -> 239.1 s
        # (-8%), same window, identical outputs. zstd was measured WORSE
        # (169 s: codec CPU exceeds the bandwidth saving); keep lz4.
        .config("spark.rdd.compress",
                os.environ.get("SPARK_GRAFT_RDD_COMPRESS", "true"))
        # keep post-shuffle partitions lean: wide string rows at the
        # default 64MB advisory size starve execution memory and spill
        # (measured: 9GB spills per aggregation stage at 32 threads).
        # Start wide and let AQE coalesce down to the advisory size.
        .config("spark.sql.adaptive.advisoryPartitionSizeInMB",
                os.environ.get("SPARK_GRAFT_ADVISORY_MB", "16"))
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                os.environ.get("SPARK_GRAFT_INIT_PARTS",
                               str(max(shuffle_partitions * 4, 64))))
    )
    # forensics hook: SPARK_GRAFT_EVENTLOG=<dir> records the event log for
    # per-stage wall/CPU analysis (the BENCH/BASELINE.md recipe)
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        builder = (builder.config("spark.eventLog.enabled", "true")
                   .config("spark.eventLog.dir", ev_dir))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
