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
