"""Sequence packing for pretraining: GPT-style concat-and-chunk placement.

Training consumes fixed-length token sequences, not documents. The
standard recipe concatenates documents in a deterministic order and cuts
the stream every `budget` tokens. This operator computes the PLACEMENT
MANIFEST — for every document: its shard, its token offset in the
shard's stream, and the first/last sequence index it lands in — so
downstream tokenizer workers can emit final sequences embarrassingly
parallel (each worker owns whole shards; no global coordination, no
second pass).

Scale shape (100 TB): documents are deterministically sharded
(doc_id % n_shards — engine-portable, layout-independent), and the only
non-map work is ONE running sum per shard (a window ordered by doc_id).
`n_shards` scales with the cluster so no single task ever sorts more
than corpus/n_shards rows; all arithmetic is integer (DIV), so the
manifest is bit-identical on any engine — the oracle is a verbatim SQL
restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_analysis import token_counts


def pack_sequences(
    docs: DataFrame, budget: int = 2048, n_shards: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, n_tokens, token_start, seq_first, seq_last) —
    concat-and-chunk placement of each document in its shard's token
    stream. Documents with zero BPE-ish tokens carry no trainable
    content and are dropped (documented contract).

    seq_first/seq_last are the first and last `budget`-token sequence
    the document overlaps (a document longer than `budget` spans several
    sequences; boundary documents straddle two)."""
    from pyspark.sql.window import Window

    t = token_counts(docs, text_col).select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        F.col("n_bpe_tokens").cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id")
    placed = t.withColumn("token_end", F.sum("n_tokens").over(w))
    return placed.select(
        "doc_id", "shard", "n_tokens",
        (F.col("token_end") - F.col("n_tokens")).alias("token_start"),
        F.expr(f"(token_end - n_tokens) div {int(budget)}").alias("seq_first"),
        F.expr(f"(token_end - 1) div {int(budget)}").alias("seq_last"),
    )
