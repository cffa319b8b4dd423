"""Dump .explain('formatted') for named queries() entries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> q1,q2,...

Writes <outdir>/<query>_<suffix>.txt. Plans are built (not executed)
on local[4] against $SPARK_GRAFT_SF_DIR (default sf0.1) — plan shape,
join strategies and PushedFilters are scale-independent for these
queries; AQE leaves 'isFinalPlan=false' since nothing runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from legal_knowledge_graph_spark.session import build_session
    import __spark_entry__ as E

    spark = build_session(master="local[4]", shuffle_partitions=8,
                          app_name="dump-plans")
    qfns = E.queries()
    for name in names:
        df = qfns[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
