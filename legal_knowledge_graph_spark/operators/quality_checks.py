"""Data-quality validation: declarative rule evaluation over a table —
the operational gate a 100 TB ingest runs before anything downstream
trusts the data. Three rule kinds, all evaluated in ONE pass:

- null_rate:   fraction of NULL values per column
- range:       values outside [lo, hi]
- expression:  any boolean SQL expression (e.g. `n_chars = length(text)`)

plus referential_integrity() as a separate LEFT ANTI probe (orphan
child keys). Outputs are long-form (rule, n_violations, n_rows,
violation_rate) so a fleet of tables can union their reports.

The reference validates only LLM output shape (mentions/edges schema
checks, /root/reference/src/langgraph_agents/nodes.py); table-level
contracts are the missing operational layer.

Scale shape: the rule battery compiles to a SINGLE aggregate projection
(one scan, map-side combinable, zero shuffle beyond the 1-row agg);
referential integrity is one LEFT ANTI equi-join that AQE broadcasts
when the parent's key set is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate rules in one aggregate pass. Each rule is a dict:
      {"name": ..., "kind": "null_rate", "col": c}
      {"name": ..., "kind": "range", "col": c, "lo": x, "hi": y}
      {"name": ..., "kind": "expression", "expr": "<bool SQL>"}
    where an `expression` rule counts rows where the expression is NOT
    true (violations include NULL results — a contract must hold
    provably). Output (rule, n_violations, n_rows, violation_rate)."""
    if not rules:
        raise ValueError("check_rules: empty rule list")
    seen = [r["name"] for r in rules]
    if len(set(seen)) != len(seen):
        dups = sorted({n for n in seen if seen.count(n) > 1})
        raise ValueError(f"check_rules: duplicate rule names {dups}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = []
    for r in rules:
        kind = r["kind"]
        if kind == "null_rate":
            cond = F.col(r["col"]).isNull()
        elif kind == "range":
            c = F.col(r["col"])
            cond = c.isNull() | (c < F.lit(r["lo"])) | (c > F.lit(r["hi"]))
        elif kind == "expression":
            cond = ~F.coalesce(F.expr(r["expr"]), F.lit(False))
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_v_{r['name']}"))
        names.append(r["name"])
    row = df.agg(*aggs)
    stacked = F.explode(F.array(*[
        F.struct(F.lit(n).alias("rule"),
                 F.col(f"_v_{n}").alias("n_violations"))
        for n in names]))
    return (
        row.select(F.col("_n").alias("n_rows"), stacked.alias("s"))
        .select("s.rule", "s.n_violations", "n_rows",
                F.round(F.col("s.n_violations")
                        / F.greatest(F.col("n_rows"), F.lit(1)), 6)
                .alias("violation_rate"))
    )


def referential_integrity(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str,
) -> DataFrame:
    """Orphan probe: child rows whose key has no parent (NULL child keys
    are orphans — a contract must hold provably). Output one row
    (n_orphans, n_child_rows, orphan_rate). ONE pass: a slim left join
    against the distinct parent keys with the counts riding a single
    aggregate — no anti-join-then-recount, no driver collect."""
    keys = parent.select(F.col(parent_key).alias(child_key)) \
        .distinct().withColumn("_hit", F.lit(1))
    probe = child.select(child_key).join(keys, child_key, "left")
    return probe.agg(
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        .alias("n_orphans"),
        F.count(F.lit(1)).alias("n_child_rows"),
        F.round(
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
            / F.greatest(F.count(F.lit(1)), F.lit(1)), 6)
        .alias("orphan_rate"))
