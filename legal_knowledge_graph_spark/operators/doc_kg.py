"""Doc-level KG operators over the generic `documents(doc_id, text)` table.

These re-express the KG pipeline's dictionary-mention -> triple -> node
semantics on the driver's shared test tables so every step has an exact
ANSI-SQL oracle (the code-corpus pipeline itself is golden-tested in
pytest; its corpus cannot be synthesized in SQL). Same operator shapes:
broadcast dictionary join (J1), triple emission + dedup (A3), node
aggregation (A2), co-occurrence edges (the J2/cluster analog on shared
data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..partitioning import repartition_compute

# closed alias->canonical term dictionary (J1 analog on the documents
# vocabulary); mirrors schema.DICTIONARY's shape
TERM_DICT: list[tuple[str, str]] = [
    ("join", "join"), ("merge", "join"),
    ("agg", "aggregation"), ("group", "aggregation"),
    ("scan", "scan"), ("filter", "scan"),
    ("sort", "ordering"), ("order", "ordering"),
    ("window", "windowing"),
    ("stream", "streaming"), ("batch", "batching"),
    ("query", "query"), ("table", "table"), ("row", "row"),
    ("column", "column"), ("spark", "spark"),
    ("customer", "customer"), ("value", "value"), ("key", "key"),
    ("hash", "hash"), ("partition", "partition"),
]


def term_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TERM_DICT, "alias string, canonical string")


def doc_term_mentions(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """Dictionary mention detection: word explode ⋈ broadcast dictionary.
    Output: doc_id, alias, canonical, n (mention count in doc)."""
    # word explode on a small-file scan: widen first (r6, partitioning
    # module note)
    words = repartition_compute(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("alias"))
    d = term_dict_df(spark)
    return (
        words.join(F.broadcast(d), "alias")
        .groupBy("doc_id", "alias", "canonical")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def doc_term_triples(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """(s,p,o) emission + dedup: doc --mentions_term--> canonical term."""
    m = doc_term_mentions(docs, spark)
    return m.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("subject"),
        F.lit("mentions_term").alias("predicate"),
        F.col("canonical").alias("object"),
    ).distinct()


def term_nodes(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """Canonical term nodes: aliases seen, doc frequency, mention count."""
    m = doc_term_mentions(docs, spark)
    return m.groupBy("canonical").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("n").alias("n_mentions"),
        F.count_distinct("alias").alias("n_aliases"),
    )


def term_cooccurrence_edges(
    docs: DataFrame, spark: SparkSession, min_docs: int = 2
) -> DataFrame:
    """Term-term edges weighted by co-occurring doc count (the entity-link
    analog on shared data): canonical pairs a<b."""
    m = doc_term_mentions(docs, spark).select("doc_id", "canonical").distinct()
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
               & (F.col("a.canonical") < F.col("b.canonical")))
        .groupBy(F.col("a.canonical").alias("term_a"),
                 F.col("b.canonical").alias("term_b"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
