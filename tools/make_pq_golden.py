"""Materialize the IVF-PQ ANN golden parquet: knn_ivf_pq's semantics
(two seeded KMeans layers + fixed-order ADC) are not SQL-expressible, so
its CORRECTNESS row checks against a committed golden captured from the
seeded, layout-pinned run — the knn_ivf determinism contract extended
with the ADC aggregate's fixed subspace order. QUALITY is separately
asserted in pytest as recall vs exact brute force.

Writes golden/{sf}/golden_pq.parquet for every testdata sf dir. Verify
reproducibility by running with SPARK_GRAFT_IVF_CHECK_CPUS set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "golden")
SFS = ["sf0.001", "sf0.01", "sf0.1"]
QUERY_IDS = [0, 1, 2, 3, 4]


def compute(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from legal_knowledge_graph_spark.operators.similarity import knn_ivf_pq

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = knn_ivf_pq(emb, QUERY_IDS, k=10)
    return out.select(
        "query_id", "neighbor_id", F.col("cosine").cast("double"),
        F.col("rank").cast("int").alias("rank"))


def rows_of(df):
    return sorted(map(tuple, df.collect()))


def main() -> None:
    from legal_knowledge_graph_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    check_cpus = os.environ.get("SPARK_GRAFT_IVF_CHECK_CPUS")
    import pyarrow as pa
    import pyarrow.parquet as pq

    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        rows = rows_of(compute(spark, sf_dir))
        out = os.path.join(ROOT, sf)
        os.makedirs(out, exist_ok=True)
        table = pa.table({
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
            "cosine": pa.array([r[2] for r in rows], pa.float64()),
            "rank": pa.array([r[3] for r in rows], pa.int32()),
        })
        pq.write_table(table, os.path.join(out, "golden_pq.parquet"))
        print(f"{sf}: {len(rows)} rows -> {out}/golden_pq.parquet")
    if check_cpus:
        spark.stop()
        spark2 = build_session(master=f"local[{check_cpus}]",
                               shuffle_partitions=int(check_cpus))
        for sf in SFS:
            want = rows_of(spark2.read.parquet(
                os.path.join(ROOT, sf, "golden_pq.parquet")))
            got = rows_of(compute(spark2, f"/root/testdata/{sf}"))
            assert got == want, f"{sf}: not reproducible at local[{check_cpus}]"
            print(f"{sf}: reproduced at local[{check_cpus}]")


if __name__ == "__main__":
    main()
