"""Bench harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", "extra"}.

- every query is forced with a noop write (count() would let Spark skip
  column work);
- the KG pipeline runs on the deterministic synthetic corpus sized for
  the sf (corpus rendered ON EXECUTORS via mapInPandas — the driver never
  holds the corpus);
- extra.kg_triples_per_sec is the north-metric throughput;
- scaling efficiency across two parallelism levels is measured by
  tools/bench_scaling.py (two processes) and reported in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from legal_knowledge_graph_spark.corpus import corpus_df_distributed
    from legal_knowledge_graph_spark.plans import run_pipeline
    from legal_knowledge_graph_spark.session import build_session
    import __spark_entry__ as E

    # default 2x cores: with exactly cores==partitions every iterative
    # stage runs as ONE all-cores wave and its stragglers set the stage
    # wall (measured 3x slower on textrank-shaped jobs, see
    # BENCH/scaling.json text_scale note); 2x lets early finishers
    # steal the tail. SPARK_GRAFT_SHUFFLE overrides for A/B.
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE",
                                 max(2 * int(cpus), 16)))
    spark = build_session(
        app_name="lkg-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )

    # steady-state protocol, same as tools/bench_scaling.py ("python
    # workers pre-warmed"): pay JVM codegen + parquet-footer + Arrow
    # python-worker spinup ONCE, untimed, so the timed section measures
    # the engine rather than process cold-start
    from legal_knowledge_graph_spark.operators.ingest import ingest
    from legal_knowledge_graph_spark.operators.mentions import (
        mentions_from_files,
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) \
            .limit(256).collect()
    mentions_from_files(ingest(corpus_df_distributed(
        spark, 64, seed=1, partitions=int(cpus)))).count()

    names = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "q4_order_priority", "top_customers_per_nation", "events_hourly",
        "events_user_top_type", "kg_doc_mentions", "kg_term_cooccurrence",
        "doc_token_count", "doc_quality", "doc_lang_id", "doc_pii",
        "doc_boilerplate", "doc_exact_dedup",
        "doc_minhash_dedup", "doc_simhash_dedup", "emb_cosine_topk",
        "emb_knn_lsh",
        # round-4 additions: two-phase stratified mixing, decontamination
        # semi-join, IVF ANN (KMeans fit included)
        "doc_stratified_sample", "doc_decontaminate", "emb_knn_ivf",
        "doc_filter_chain",
        # round-5 additions: iterative PageRank over the purchase graph,
        # corpus-trained unigram-LM quality scoring, sequence packing
        "graph_pagerank", "doc_lm_score", "doc_pack_sequences",
        # round-5 late additions: skew-safe triangle counting, tokenizer
        # vocab coverage, tf-idf keywording
        "graph_triangles", "doc_vocab", "doc_tfidf_keywords",
        "graph_communities", "doc_collocations",
        "doc_mixture_plan", "doc_mixture_sample",
        # round-5 third-session additions: duplicate-passage spans, BM25
        # ranked retrieval, HITS hubs/authorities
        "doc_dup_spans", "doc_dup_clean", "doc_bm25", "graph_hits",
        "graph_kcore", "graph_bfs", "doc_length_stats", "doc_bpe_merges",
        "events_funnel", "events_retention",
        # round-5 fourth-session additions: as-of join, bucketed range
        # join, DSIR importance weighting
        "events_asof", "events_error_aftermath", "doc_importance",
        # round-5 fifth-session additions: link prediction (CN/Jaccard/
        # Adamic-Adar) with the apex-degree hub cap; CCNet head/middle/
        # tail perplexity terciles
        "graph_link_predict", "doc_ccnet_buckets", "graph_ppr",
        "events_dau", "doc_ngram_diversity", "emb_knn_pq",
        "events_funnel_latency", "doc_weighted_sample", "events_overlap",
        "doc_chunks",
        # round-5 sixth-session additions: weighted shortest paths,
        # Markov next-event transitions, rolling z-score anomalies
        "graph_sssp", "events_markov", "events_anomaly",
        "doc_inverted_index", "emb_knn_classify", "emb_project",
        "events_kmv_users", "events_kmv_rolling", "lineitem_zorder",
        "part_fuzzy_names", "doc_length_bins", "lineitem_corr",
        "events_type_hour_mi", "doc_textrank", "events_ohlc",
        "events_assoc", "dq_lineitem", "dq_lineitem_fk",
        "lineitem_rollup", "orders_diff", "lineitem_quantiles",
        "events_key_skew", "doc_rake",
    ]
    qfns = E.queries()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        force(qfns[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # KG pipeline: the north-star workload, corpus rendered on executors
    n_files = E._corpus_size(sf_dir)
    files = corpus_df_distributed(
        spark, n_files, seed=42, partitions=max(int(cpus) * 2, 16))
    t0 = time.time()
    res = run_pipeline(spark, files, use_lsh="auto",
                       bucket_by_repo=max(int(cpus), 16))
    n_triples = res.edges.count()
    force(res.nodes)
    kg_secs = round(time.time() - t0, 3)
    timings["kg_pipeline"] = kg_secs

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": {
            "cpus": int(cpus),
            "kg_files": n_files,
            "kg_triples": int(n_triples),
            "kg_triples_per_sec": round(n_triples / kg_secs, 2) if kg_secs else None,
        },
    }))


if __name__ == "__main__":
    main()
