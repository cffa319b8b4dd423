"""Deduplication operators for training-data pipelines.

Five dedup families, each a `queries()` entry with an oracle where
SQL-expressible (exact, n-gram Jaccard, embedding-cosine) and rows-only
otherwise (MinHash-LSH, SimHash):

- exact:        hash-groupBy on the normalized-content fingerprint
- ngram-jaccard: word-shingle inverted index -> pair Jaccard (exact)
- minhash-lsh:  shingles -> HashingTF -> MinHashLSH banding -> candidate
                pairs -> exact Jaccard verify (the 100 TB scale path:
                candidates ~ O(near-dups), not O(n^2))
- simhash:      64-bit token-hash bit-majority signature; near-dups share
                a 16-bit band (Hamming <= 3 within 4 bands by pigeonhole)
- embedding:    cosine >= threshold near-dup pairs over array<float>

Scale notes: pair generation is always blocked (shared shingle / LSH
bucket / simhash band / id-range), never a cross join; shingle blocking is
df-capped so a ubiquitous shingle cannot quadratically explode a
partition (the same guard as canonicalize.TOKEN_DF_CAP).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .text_analysis import fingerprints

SHINGLE_K = 3
SHINGLE_DF_CAP = 500


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint,
    representative (min doc_id), n_docs. min_count=2 keeps only true dup
    groups; min_count=1 emits the full dedup table (rep per group)."""
    fp = fingerprints(docs, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_count)
    )


def _shingles(docs: DataFrame, text_col: str) -> DataFrame:
    """doc_id, shingle (distinct K-word shingles of the lowercased text).
    Pure Catalyst: split -> transform over indices -> explode."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - SHINGLE_K, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, SHINGLE_K)))
    return (
        docs.where(n >= SHINGLE_K)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text",
    df_cap: int = SHINGLE_DF_CAP,
) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs via inverted-index blocking:
    only doc pairs sharing >=1 (non-ubiquitous) shingle are compared."""
    sh = _shingles(docs, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    rare = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap).select("shingle")
    )
    sh_b = sh.join(rare, "shingle")
    a, b = sh_b.alias("a"), sh_b.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text",
    num_hash_tables: int = 8,
) -> DataFrame:
    """MinHash+LSH near-dup candidates with exact verify: the scale path
    (shingle -> minhash -> band -> bucket-join, cost ~ O(candidates))."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = _shingles(docs, text_col).groupBy("doc_id").agg(
        F.collect_set("shingle").alias("sh"))
    tf = HashingTF(inputCol="sh", outputCol="tf", numFeatures=1 << 20, binary=True)
    feats = tf.transform(sh).select("doc_id", "tf")
    lsh = MinHashLSH(inputCol="tf", outputCol="mh",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="d")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("d"), 6).alias("jaccard"),
        )
    )


@F.pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash: per-token md5-derived 64-bit hashes, bitwise
    majority vote."""

    def simhash(text: str) -> int:
        toks = (text or "").lower().split()
        if not toks:
            return 0
        acc = [0] * 64
        for tok in set(toks):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        v = 0
        for bit in range(64):
            if acc[bit] > 0:
                v |= 1 << bit
        return v - (1 << 64) if v >= (1 << 63) else v

    return texts.map(simhash)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", _simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dups by Hamming(simhash) <= k, found by 16-bit band blocking
    (pigeonhole: hamming<=3 over 4 bands => >=1 identical band)."""
    sig = simhash_signatures(docs, text_col)
    bands = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(i),
                        F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)))
            for i in range(4)
        ])).alias("band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95,
) -> DataFrame:
    """Cosine >= threshold pairs over (vec_id, embedding array<float>).
    Exact within id-blocked self-join at test scale; production swaps the
    blocking for the LSH buckets in similarity.py."""
    from .similarity import cosine_expr

    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("e_a"), F.col("e_b"))
    return pairs.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).where(F.col("cosine") >= threshold)
