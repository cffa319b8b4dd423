"""Physical-plan assertions: the plans we want, not just plans that pass.

Checks (via .explain formatted output) that:
- parquet scans push filters down (PushedFilters) and prune columns
  (ReadSchema excludes unused columns);
- small dimensions join via BroadcastHashJoin;
- relational stages run inside WholeStageCodegen;
- the KG triple-emission stage contains NO python UDF (pure Catalyst).

Run: python tools/explain_check.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from legal_knowledge_graph_spark.session import build_session
    import __spark_entry__ as E

    spark = build_session(master="local[8]", shuffle_partitions=8)
    failures = []

    def check(name, plan, must_contain=(), must_not=()):
        for frag in must_contain:
            if frag not in plan:
                failures.append(f"{name}: missing {frag!r}")
        for frag in must_not:
            if frag in plan:
                failures.append(f"{name}: unexpected {frag!r}")
        print(f"[{name}] "
              + " ".join(f"{frag}={'Y' if frag in plan else 'N'}"
                         for frag in must_contain + must_not))

    # q6: filter pushdown + column pruning on the lineitem scan
    # ("Batched: true" = vectorized columnar scan; AQE hides the
    # WholeStageCodegen label in pre-execution formatted plans)
    p = plan_of(E.q6_revenue(spark, sf_dir))
    check("q6 pushdown", p, must_contain=(
        "PushedFilters: [IsNotNull(l_shipdate)", "Batched: true"))
    if "l_returnflag" in p.split("ReadSchema")[-1][:400]:
        failures.append("q6: ReadSchema not pruned (reads l_returnflag)")

    # q3: broadcast of the filtered customer dim
    p = plan_of(E.q3_shipping_priority(spark, sf_dir))
    check("q3 broadcast", p, must_contain=("BroadcastHashJoin",))

    # q5: six-way join uses broadcasts for nation/region
    p = plan_of(E.q5_local_supplier(spark, sf_dir))
    check("q5 broadcast", p, must_contain=("BroadcastHashJoin",))

    # doc-KG dictionary join is broadcast (J1)
    p = plan_of(E.kg_doc_mentions(spark, sf_dir))
    check("kg_doc_mentions broadcast", p, must_contain=("BroadcastHashJoin",))

    # triple emission: pure Catalyst — no python evaluation nodes
    from legal_knowledge_graph_spark.corpus import corpus_df
    from legal_knowledge_graph_spark.operators.ingest import ingest
    from legal_knowledge_graph_spark.operators.mentions import mentions_from_files
    from legal_knowledge_graph_spark.operators.triples import emit_triples

    mentions = mentions_from_files(ingest(corpus_df(spark, 20, 42)))
    p = plan_of(emit_triples(mentions))
    check("emit_triples JVM-only", p,
          must_contain=("Generate",),  # the explode
          must_not=("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"))

    # similarity cosine: JVM higher-order functions, no UDF
    p = plan_of(E.emb_cosine_topk(spark, sf_dir))
    check("emb_cosine_topk JVM-only", p,
          must_not=("BatchEvalPython", "ArrowEvalPython"))

    # embedding near-dup: LSH-bucket blocked, never an O(n^2) pair join
    # (VERDICT r1 #1)
    p = plan_of(E.emb_near_dup(spark, sf_dir))
    check("emb_near_dup no-cartesian", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct"))

    # round-4 ops: the filter chain must stay a single zero-shuffle
    # projection; stratified sampling and keep-one dedup must never go
    # nested-loop/cartesian
    p = plan_of(E.doc_filter_chain(spark, sf_dir))
    check("doc_filter_chain zero-shuffle", p,
          must_not=("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"))
    p = plan_of(E.doc_stratified_sample(spark, sf_dir))
    check("doc_stratified_sample no-cartesian", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct"))
    p = plan_of(E.doc_dedup_keep(spark, sf_dir))
    check("doc_dedup_keep no-cartesian", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct"))
    for gq in ("doc_minhash_groups", "doc_simhash_groups",
               "emb_dedup_keep", "graph_link_predict", "emb_knn_pq"):
        p = plan_of(E.queries()[gq](spark, sf_dir))
        check(f"{gq} no-cartesian", p,
              must_not=("BroadcastNestedLoopJoin", "CartesianProduct"))

    # dedup pair generators (VERDICT r2 #8): every candidate stage must be
    # an equi-join on blocking keys — no nested-loop/cartesian anywhere —
    # and the shuffle count must stay at the designed number (an Exchange
    # regression means a blocking key or pre-aggregation was lost).
    # r6: caps re-baselined — the widening repartitions (partitioning
    # module: repartition_wide pins fan-out joins against AQE
    # coalescing, repartition_compute parallelizes small-file scans)
    # are REPARTITION exchanges that appear once per subtree reference
    # in the printed plan but are reused at runtime (ReusedExchange).
    for qname, max_exchanges in [("doc_ngram_jaccard", 14),
                                 ("doc_minhash_dedup", 24),
                                 ("doc_simhash_dedup", 16)]:
        p = plan_of(E.queries()[qname](spark, sf_dir))
        check(f"{qname} no-cartesian", p,
              must_not=("BroadcastNestedLoopJoin", "CartesianProduct"))
        # formatted output lists each node once in the tree and once as a
        # "(N) Exchange" detail header — count the headers
        import re
        n_ex = len(re.findall(r"\(\d+\) Exchange", p))
        print(f"[{qname} shuffles] Exchange={n_ex} (max {max_exchanges})")
        if n_ex > max_exchanges:
            failures.append(
                f"{qname}: {n_ex} Exchange nodes (max {max_exchanges})")

    # round-5 ops: PageRank's final top-k must be TakeOrderedAndProject
    # (per-partition top-k + merge, never a global sort) and the iteration
    # plan is checkpoint-rooted so only the LAST iteration's join shows;
    # the LM scorer is pure Catalyst (explode/agg/join, no python)
    p = plan_of(E.graph_pagerank(spark, sf_dir))
    check("graph_pagerank topk", p,
          must_contain=("TakeOrderedAndProject",),
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))
    p = plan_of(E.doc_lm_score(spark, sf_dir))
    check("doc_lm_score JVM-only", p,
          must_not=("BatchEvalPython", "ArrowEvalPython",
                    "BroadcastNestedLoopJoin", "CartesianProduct"))

    # triangle counting: equi-joins only — the degree-ordered wedge join
    # must never degrade to a nested-loop/cartesian shape, and the whole
    # operator stays JVM-side
    p = plan_of(E.graph_triangles(spark, sf_dir))
    check("graph_triangles equi-joins", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))

    # vocab/tfidf: the ONLY nested-loop allowed is the one-row broadcast
    # scalar (total tokens / doc count); never a CartesianProduct, never
    # Python, and top-V arrives via TakeOrderedAndProject not a sort
    p = plan_of(E.doc_vocab(spark, sf_dir))
    check("doc_vocab topV", p,
          must_contain=("TakeOrderedAndProject",),
          must_not=("CartesianProduct", "BatchEvalPython",
                    "ArrowEvalPython"))
    p = plan_of(E.doc_tfidf_keywords(spark, sf_dir))
    check("doc_tfidf JVM-only", p,
          must_not=("CartesianProduct", "BatchEvalPython",
                    "ArrowEvalPython"))

    # label propagation: per-round equi-join + window argmax only
    p = plan_of(E.graph_communities(spark, sf_dir))
    check("graph_communities equi-joins", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))
    # PMI: zip-shift bigrams (no self-join), top-k never a global sort
    p = plan_of(E.doc_collocations(spark, sf_dir))
    check("doc_collocations topk", p,
          must_contain=("TakeOrderedAndProject",),
          must_not=("CartesianProduct", "BatchEvalPython",
                    "ArrowEvalPython"))
    # mixture resample: rate table broadcast into ONE hash join over the
    # corpus, acceptance filter stays a pure projection (no window)
    p = plan_of(E.doc_mixture_sample(spark, sf_dir))
    check("doc_mixture_sample broadcast", p,
          must_contain=("BroadcastHashJoin",),
          must_not=("CartesianProduct", "BatchEvalPython",
                    "ArrowEvalPython", "Window"))

    # dup spans: semi-join mark + islands window, equi-joins only, no
    # python, and the whole thing JVM-side
    p = plan_of(E.doc_dup_spans(spark, sf_dir))
    check("doc_dup_spans equi-joins", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))
    # BM25: the ONLY nested-loop allowed is the one-row broadcast stats
    # attach; tf stays an array-filter projection (no explode-join against
    # a posting table -> at most the stats attach + the rank window
    # exchange)
    p = plan_of(E.doc_bm25(spark, sf_dir))
    check("doc_bm25 JVM-only", p,
          must_not=("CartesianProduct", "BatchEvalPython",
                    "ArrowEvalPython", "SortMergeJoin"))
    # HITS: checkpoint-rooted iterations — only the final attach joins
    # show; top-k via TakeOrderedAndProject, equi-joins only
    p = plan_of(E.graph_hits(spark, sf_dir))
    check("graph_hits topk", p,
          must_contain=("TakeOrderedAndProject",),
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))

    # dup-span removal: anti-join application stays equi-join/JVM-only
    p = plan_of(E.doc_dup_clean(spark, sf_dir))
    check("doc_dup_clean equi-joins", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))
    # k-core: checkpoint-rooted rounds; final degree agg only, no python
    p = plan_of(E.graph_kcore(spark, sf_dir))
    check("graph_kcore equi-joins", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))

    # length stats: one agg, no joins, no python
    p = plan_of(E.doc_length_stats(spark, sf_dir))
    check("doc_length_stats one-agg", p,
          must_not=("Join", "BatchEvalPython", "ArrowEvalPython"))

    # BFS: checkpoint-rooted rounds, equi-joins only, no python
    p = plan_of(E.graph_bfs(spark, sf_dir))
    check("graph_bfs equi-joins", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))
    # funnel: user-keyed equi-join chain, the only nested loop is the
    # one-row first-step attach; retention joins user-to-user
    p = plan_of(E.events_funnel(spark, sf_dir))
    check("events_funnel equi-joins", p,
          must_not=("CartesianProduct", "BatchEvalPython",
                    "ArrowEvalPython"))
    p = plan_of(E.events_retention(spark, sf_dir))
    check("events_retention equi-joins", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))
    # BPE: checkpoint-rooted merge rounds, final table is driver-built
    # (the learned artifact); the per-round pair agg is gated by running
    # one round's plan shape via the operator's own word table
    from legal_knowledge_graph_spark.operators.bpe import _word_table
    wt = _word_table(E._t(spark, sf_dir, "documents"), "text")
    check("bpe word-table JVM-only", plan_of(wt),
          must_not=("BatchEvalPython", "ArrowEvalPython", "Join"))

    # as-of join: union + window carry — NO join node at all, no python
    p = plan_of(E.events_asof(spark, sf_dir))
    check("events_asof joinless window", p,
          must_not=("Join", "BatchEvalPython", "ArrowEvalPython"))
    # range join: bucket equi-join + residual — never nested-loop
    p = plan_of(E.events_error_aftermath(spark, sf_dir))
    check("events_error_aftermath equi-join", p,
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython"))
    # DSIR: bounded bucket table broadcast into the scoring scan
    p = plan_of(E.doc_importance(spark, sf_dir))
    check("doc_importance broadcast scoring", p,
          must_contain=("BroadcastHashJoin",),
          must_not=("BroadcastNestedLoopJoin", "CartesianProduct",
                    "BatchEvalPython", "ArrowEvalPython",
                    "SortMergeJoin"))

    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
