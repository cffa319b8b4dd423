"""Event-stream analytics: ordered funnels and retention cohorts.

Rounds out the events surface next to the hourly/top-type/session
queries: the two canonical product-analytics shapes, both pure Catalyst
with exact SQL oracles (timestamps compare exactly; all outputs are
integers or rounded ratios of integers).

Scale shape (100 TB of events): every stage keys on user_id — the
funnel is a chain of per-step filtered aggregations joined user-to-user
(AQE co-partitions the chain on the same key; each step's input shrinks
to the previous step's survivors), retention is one (user) agg plus one
(user, week) distinct — no windows over the raw stream, no skew beyond
a single user's own events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame, steps: list[str],
    user_col: str = "user_id", type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: a user completes step k at the
    EARLIEST event of that type strictly after their step-(k-1)
    completion (first-touch semantics). Output: (step_no, step,
    n_users, frac_of_first) with frac rounded 6.

    Each step is one filtered agg + one equi-join against the previous
    survivors; counts ride a final tiny union of single-row aggregates."""
    prev = None
    step_counts = []
    for i, st in enumerate(steps):
        ev = events.where(F.col(type_col) == st).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("t"))
        if prev is None:
            cur = ev.groupBy("user").agg(F.min("t").alias("t_done"))
        else:
            cur = (
                ev.join(prev, "user")
                .where(F.col("t") > F.col("t_done"))
                .groupBy("user").agg(F.min("t").alias("t_done"))
            )
        cur = cur.localCheckpoint()  # each step reuses the survivor set
        step_counts.append(cur.agg(
            F.lit(i + 1).cast("int").alias("step_no"),
            F.lit(st).alias("step"),
            F.count(F.lit(1)).alias("n_users")))
        prev = cur
    out = step_counts[0]
    for sc in step_counts[1:]:
        out = out.unionByName(sc)
    first = out.where(F.col("step_no") == 1) \
        .select(F.col("n_users").alias("n_first"))
    return out.crossJoin(F.broadcast(first)).select(
        "step_no", "step", "n_users",
        F.round(F.col("n_users").cast("double")
                / F.greatest(F.col("n_first"), F.lit(1)), 6)
        .alias("frac_of_first"))


def retention_cohorts(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = the Monday-truncated week of
    a user's first event; a (cohort, offset) cell counts users active in
    cohort_week + offset weeks. Output: (cohort_week date, week_offset
    int, n_users) — integer-exact."""
    ev = events.select(F.col(user_col).alias("user"),
                       F.date_trunc("week", F.col(ts_col)).alias("wk"))
    first = ev.groupBy("user").agg(F.min("wk").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(first, "user")
        .select(
            F.date_format(F.col("cohort"), "yyyy-MM-dd")
            .alias("cohort_week"),
            (F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date"))
             / 7).cast("int").alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_active_users(
    events: DataFrame, window_days: int = 7,
    user_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """Daily + trailing-window activity profile: for every day present
    in the stream, (day, dau, wau, n_events) where dau = distinct users
    that day, wau = distinct users in the `window_days` window ENDING at
    that day, n_events = raw event count.

    Scale shape (100 TB of events): the raw stream collapses to a
    (day, user)-distinct table in one shuffle (bounded by users x days,
    orders of magnitude below events); rolling distinct is NOT
    window-decomposable, so each daily pair fans out to the
    `window_days` future windows it serves via a sequence-explode —
    a bounded x7 expansion of the SMALL table, one (day, user) dedup,
    one count. No theta-join (the oracle deliberately uses the
    quadratic BETWEEN join this shape avoids), no window over the raw
    stream, no count-distinct state beyond one day's users."""
    day = F.to_date(F.col(ts_col))
    stats = events.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.col(user_col)).alias("dau"))
    daily = events.select(day.alias("day"),
                          F.col(user_col).alias("u")).distinct()
    contrib = daily.select(
        F.explode(F.sequence(
            F.col("day"), F.date_add(F.col("day"), window_days - 1)
        )).alias("day"),
        "u",
    ).dropDuplicates(["day", "u"])
    wau = contrib.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    # inner join restricts to days actually present (future-only fan-out
    # days have no stats row); every present day has wau >= dau >= 1
    return (
        stats.join(wau, "day")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                "dau", "wau", "n_events")
    )


def funnel_latency(
    events: DataFrame, steps: list[str],
    user_col: str = "user_id", type_col: str = "event_type",
    ts_col: str = "ts", exact: bool = True,
) -> DataFrame:
    """Conversion-latency profile for an ordered funnel: for every step
    k >= 2, statistics of (step-k completion time - step-(k-1)
    completion time) in whole seconds across converting users —
    (step_no, step, n_users, p50_s, p90_s, mean_s). First-touch step
    semantics are identical to `funnel` (a user completes step k at the
    earliest event strictly after their step-(k-1) completion), so the
    two queries describe the same cohort.

    Engine-exact: latencies are integer seconds (unix_timestamp diff);
    exact percentiles are type-7 (= quantile_cont) over integers, mean
    is CAST(sum AS DOUBLE)/count on both sides. exact=False switches to
    approx_percentile (t-digest) for funnels whose per-step cohorts are
    too large to buffer — the corpus_length_stats discipline.

    Scale shape: the step chain is the same per-step filtered agg +
    user equi-join as `funnel` (each step's input shrinks to prior
    survivors); the previous completion time rides the join, so
    latency stats cost ONE extra one-row aggregate per step."""
    prev = None
    stat_rows = []
    for i, st in enumerate(steps):
        ev = events.where(F.col(type_col) == st).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("t"))
        if prev is None:
            cur = ev.groupBy("user").agg(F.min("t").alias("t_done")) \
                .localCheckpoint()
        else:
            joined = (
                ev.join(prev, "user")
                .where(F.col("t") > F.col("t_done"))
                .groupBy("user")
                .agg(F.min("t").alias("t_done"),
                     # t_done is constant per user in the joined stream
                     F.min("t_done").alias("t_prev"))
                .localCheckpoint()
            )
            lat = (F.unix_timestamp("t_done")
                   - F.unix_timestamp("t_prev")).alias("lat")
            base = joined.select(lat)
            if exact:
                pct = [F.percentile("lat", p) for p in (0.5, 0.9)]
            else:
                pct = [F.approx_percentile("lat", p, 10000)
                       for p in (0.5, 0.9)]
            stat_rows.append(base.agg(
                F.lit(i + 1).cast("int").alias("step_no"),
                F.lit(st).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
                F.round(pct[0], 6).alias("p50_s"),
                F.round(pct[1], 6).alias("p90_s"),
                F.round(F.sum("lat").cast("double")
                        / F.greatest(F.count(F.lit(1)), F.lit(1)), 6)
                .alias("mean_s")))
            cur = joined.select("user", "t_done")
        prev = cur
    out = stat_rows[0]
    for sr in stat_rows[1:]:
        out = out.unionByName(sr)
    return out
