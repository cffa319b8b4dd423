"""Incremental (Structured Streaming) extraction equals the batch run."""

import os

from legal_knowledge_graph_spark.corpus import corpus_df
from legal_knowledge_graph_spark.operators.ingest import ingest
from legal_knowledge_graph_spark.operators.mentions import mentions_from_files
from legal_knowledge_graph_spark.streaming import run_incremental


def test_incremental_equals_batch(spark, tmp_path):
    files = corpus_df(spark, 40, seed=42)
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    files.write.mode("overwrite").parquet(landing)

    run_incremental(spark, landing, out, ckpt)
    streamed = spark.read.parquet(out)
    batch = mentions_from_files(ingest(files))
    s = sorted(r.mention_id for r in streamed.collect())
    b = sorted(r.mention_id for r in batch.collect())
    assert s == b

    # draining again with the same checkpoint is a no-op (exactly-once)
    run_incremental(spark, landing, out, ckpt)
    assert sorted(r.mention_id for r in spark.read.parquet(out).collect()) == s
