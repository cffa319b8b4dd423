"""Graph analytics over edge tables: PageRank (plus degree helpers).

The reference exposes the knowledge graph for downstream querying
(/root/reference/src/neo4j/models.py:100-159 read paths; its QA surface
reports entity importance only as mention counts). Ranking entities by
link structure is the natural next query over the same store — and a
canonical iterative-algorithm shape for the engine: one equi-join plus
one aggregation per iteration, lineage cut per step, no driver-side
loops over data.

Scale shape (100 TB): the edge table is the fat side and is joined once
per iteration on its source key; the rank table is node-sized and is
broadcast only while the OBSERVED node count stays under the threshold
(the coref/neighbors discipline), else the join falls back to a shuffle
co-partitioned on the same key every iteration (AQE reuses the
exchange). Dangling mass is recovered from the observe()d contribution
sum riding each iteration's checkpoint — no extra job, no driver
collect of node data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BROADCAST_RANKS_MAX = 2_000_000
BROADCAST_EDGES_MAX = 4_000_000
# Separate, higher ceiling for a PACKED-LONG edge-key build side
# (triangle_count's closing-edge semi-join when node ids pack into one
# long). r6 stage forensics at sf1.0: with 8.5M closing edges just over
# the generic 4M cap, the ~30x-larger wedge table (200M rows) was
# shuffled instead — 7 GB shuffle read + 6.5 GB spill, 77 s in one
# stage (graph_triangles 133 s -> 32 s once broadcast). A LongHashed-
# Relation is ~16 B/row, so 32M rows is ~0.5 GB — inside the guide's
# "a few hundred MB is fine" broadcast budget (§3.1) and far below the
# 8 GB / 512M-row hard cap — while the wedge table it spares is
# O(sum outdeg^2). The generic cap stays 4M: a string-keyed build was
# measured strictly WORSE at 5.7M rows (link_prediction 15.6 s -> 24.7 s
# when force-broadcast: single-threaded driver build of a wide string
# relation outweighs the shuffle it saves). Above the cap the shuffled
# semi-join remains the 100 TB path.
BROADCAST_EDGE_KEYS_MAX = 32_000_000


def _side(df: DataFrame, n_rows: int) -> DataFrame:
    return F.broadcast(df) if n_rows <= BROADCAST_RANKS_MAX else df


def pagerank(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    damping: float = 0.85, n_iter: int = 10,
    seeds: list | None = None,
) -> DataFrame:
    """PageRank with dangling-mass redistribution, `n_iter` fixed
    iterations (deterministic given the edge set — the oracle unrolls the
    same recurrence in SQL).

    rank_{t+1}(v) = (1-d)*tele(v) + d * (sum_{u->v} rank_t(u)/outdeg(u)
                                         + dangling_t * tele(v))

    where tele is uniform 1/N without `seeds` (classic PageRank), and
    with `seeds` it is the PERSONALIZED teleport: 1/|S| on the seed
    nodes present in the graph, 0 elsewhere (rank_0 = tele), giving
    proximity-to-the-seed-set scores — the standard "entities relevant
    to X" query over a knowledge graph. dangling_t = 1 - total
    contributed mass (the rank invariant sum(rank_t) = 1 makes the two
    equal, and the contribution sum rides the iteration's checkpoint via
    observe()). Seeds absent from the graph are ignored (the teleport
    renormalizes over present seeds). The seeded path adds one constant
    `tele` column on the node table — same joins, same shuffles, and
    the unseeded arithmetic is bit-identical to before the parameter
    existed."""
    from pyspark.sql import Observation

    # materialize the deduped edge set ONCE: nodes, out-degrees and the
    # adjacency all derive from it (otherwise the upstream join/dedup
    # subtree re-executes three times)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .dropDuplicates(["src", "dst"]).localCheckpoint()
    obs_n = Observation()
    seed_list = sorted(set(seeds)) if seeds else []
    is_seed = F.col("node").isin(seed_list) if seed_list else F.lit(False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .observe(obs_n, F.count(F.lit(1)).alias("n"),
                 F.sum(is_seed.cast("long")).alias("ns"))
        .localCheckpoint()
    )
    n_nodes = obs_n.get["n"]
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    if seed_list:
        n_seeds = obs_n.get["ns"] or 0
        if n_seeds == 0:
            raise ValueError("no seed node exists in the graph")
        # tele is a pure EXPRESSION of node (isin -> 1/|S| else 0): no
        # materialized column, no extra checkpoint/job
        tele = F.when(is_seed, F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    adj = e.join(outdeg, "src").localCheckpoint()  # static across iterations

    ranks = nodes.select(
        "node",
        (tele if seed_list else F.lit(1.0 / n_nodes)).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        obs = Observation()
        contribs = (
            adj.join(_side(ranks, n_nodes), ranks["node"] == adj["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
            .observe(obs, F.sum("c").alias("s"))
            .localCheckpoint()
        )
        contributed = obs.get["s"] or 0.0
        dangling = max(0.0, 1.0 - contributed)
        if seed_list:
            # (1-d)*tele + d*(c + dangling*tele): the same recurrence
            # with the teleport vector in place of the uniform 1/N
            upd = (F.lit(1.0 - damping) * tele
                   + F.lit(damping)
                   * (F.coalesce(F.col("c"), F.lit(0.0))
                      + F.lit(dangling) * tele))
        else:
            upd = (F.lit(base) + F.lit(damping)
                   * (F.coalesce(F.col("c"), F.lit(0.0))
                      + F.lit(dangling / n_nodes)))
        ranks = nodes.join(
            _side(contribs, n_nodes), nodes["node"] == contribs["dst"], "left"
        ).select("node", upd.alias("rank"))
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over the undirected simple graph induced by `edges` (self-loops and
    duplicate/reverse edges collapsed).

    Returns (node, degree, n_triangles, clustering) for every node, with
    clustering = 2*t / (d*(d-1)) rounded to 6 places (0.0 when d < 2).

    Scale shape (100 TB edge table): the classic skew killer is wedge
    enumeration at hub nodes — a degree-10^6 hub contributes 10^12
    wedges under naive id-ordering. This uses degree-ordered orientation
    (each undirected edge directed from its (degree, id)-smaller
    endpoint), which bounds every node's oriented out-degree by
    O(sqrt(m)) [Chiba–Nishizeki; the standard MapReduce/GraphX variant],
    so the wedge join is skew-safe regardless of hub degree. Triangle
    counts are orientation-invariant, so the DuckDB oracle can use the
    simple a<b<c id-ordered form and must agree exactly. All joins are
    equi-joins on node ids; the only shuffles are the degree agg and the
    wedge self-join. The closing-edge semi-join is the hot spot (wedges
    outnumber edges ~30x on dense graphs): the edge set is broadcast
    while its OBSERVED count stays under BROADCAST_EDGES_MAX — the wedge
    table then never shuffles — and falls back to a shuffled semi-join
    above it (the 100 TB path). No cross joins, no driver collect."""
    from pyspark.sql import Observation

    # canonical undirected simple edges: (a, b) with a < b; the edge
    # count rides the checkpoint via observe() — no extra job
    obs_e = Observation()
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .dropDuplicates(["a", "b"])
        .observe(obs_e, F.count(F.lit(1)).alias("m"))
        .localCheckpoint()  # degree, orientation and closing join all reuse it
    )
    n_edges = obs_e.get["m"]
    # the degree table is consumed by the orientation joins AND the final
    # result join; its checkpoint also carries the node-id range so the
    # closing-edge key can be packed into ONE long (LongHashedRelation
    # fast path, ~2x the probe rate of a two-column struct key) whenever
    # ids are integral and provably fit in 32 bits
    node_type = dict(e0.dtypes)["a"]
    integral = node_type in ("tinyint", "smallint", "int", "bigint")
    obs_d = Observation()
    deg_plan = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    )
    if integral:
        deg = deg_plan.observe(
            obs_d, F.min("node").alias("lo"), F.max("node").alias("hi")
        ).localCheckpoint()
        packable = (
            n_edges > 0 and obs_d.get["lo"] is not None
            and obs_d.get["lo"] >= 0 and obs_d.get["hi"] < (1 << 31))
    else:
        deg = deg_plan.localCheckpoint()
        packable = False
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    ed = e0.join(da, "a").join(db, "b")
    # orient from the (degree, id)-smaller endpoint; keep the head's
    # degree so the wedge join can order its two heads the same way
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("tail"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("head"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("head_deg"),
    ).localCheckpoint()  # wedge join consumes it twice, closing join once
    # wedge fan-out (~30x the edges): pin the self-join's width against
    # AQE coalescing (partitioning module note) — the join input is a
    # small shuffle but each task emits O(sum outdeg^2) wedge rows
    from ..partitioning import repartition_wide

    o_wide = repartition_wide(oriented, "tail")
    o1, o2 = o_wide.alias("o1"), o_wide.alias("o2")
    # wedges (x, y) around a shared tail, x before y in (degree, id) order
    # => if the triangle closes, the closing oriented edge is exactly x->y
    x_first = (F.col("o1.head_deg") < F.col("o2.head_deg")) | (
        (F.col("o1.head_deg") == F.col("o2.head_deg"))
        & (F.col("o1.head") < F.col("o2.head")))
    wedges = o1.join(o2, F.col("o1.tail") == F.col("o2.tail")).where(x_first) \
        .select(F.col("o1.tail").alias("apex"),
                F.col("o1.head").alias("x"), F.col("o2.head").alias("y"))
    closing = oriented.select(F.col("tail").alias("x"), F.col("head").alias("y"))
    if packable:
        pack = F.lit(1 << 32)
        wk = wedges.withColumn(
            "k", F.col("x").cast("long") * pack + F.col("y").cast("long"))
        ck = closing.select(
            (F.col("x").cast("long") * pack + F.col("y").cast("long"))
            .alias("k"))
        tris = wk.join(
            F.broadcast(ck) if n_edges <= BROADCAST_EDGE_KEYS_MAX else ck,
            "k", "left_semi").drop("k")
    else:
        tris = wedges.join(
            F.broadcast(closing) if n_edges <= BROADCAST_EDGES_MAX
            else closing,
            ["x", "y"], "left_semi")
    # ONE traversal of the wedge/semi subtree: explode the three corners
    # (a 3-way union would re-execute the 30x-fan-out wedge join once
    # per branch)
    per_node = (
        tris.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node", "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0 * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))), 6),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree) over a distinct edge set."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .dropDuplicates(["src", "dst"])
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def label_propagation(
    edges: DataFrame, src: str = "src", dst: str = "dst", n_iter: int = 5,
) -> DataFrame:
    """Synchronous label propagation (community detection), `n_iter`
    fixed rounds — deterministic: every node starts labeled with its own
    id; each round every node adopts the most frequent label among its
    neighbors (undirected), ties broken by the smallest label. Nodes are
    edge endpoints, so every node has >= 1 neighbor and every round
    relabels every node. The oracle unrolls the identical recurrence in
    SQL (MATERIALIZED CTEs).

    Scale shape (100 TB): per round, ONE equi-join of the symmetrized
    edge table with the node-sized label table (broadcast only while the
    OBSERVED node count stays under the threshold — the coref/pagerank
    discipline), one map-side-combined (node, label) vote count, and one
    per-node argmax window over that node's own candidate labels. Each
    round's lineage is cut with a checkpoint; no driver-side data."""
    from pyspark.sql import Observation

    # symmetrize: (v, u) for both directions, self-loops dropped
    half = edges.select(F.col(src).alias("v"), F.col(dst).alias("u")) \
        .where(F.col("v") != F.col("u"))
    e = half.unionByName(half.select(F.col("u").alias("v"),
                                     F.col("v").alias("u"))) \
        .dropDuplicates(["v", "u"]).localCheckpoint()
    obs_n = Observation()
    labels = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .observe(obs_n, F.count(F.lit(1)).alias("n"))
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    n_nodes = obs_n.get["n"]
    for _ in range(n_iter):
        neigh = labels.select(F.col("node").alias("u"), "label")
        votes = (
            e.join(_side(neigh, n_nodes), "u")
            .groupBy("v", "label").agg(F.count(F.lit(1)).alias("n"))
        )
        # r6: the per-round argmax is min(struct(-n, label)) — exactly
        # (n DESC, label ASC), integer/string-exact — instead of a
        # row_number window, removing the per-round sort + window
        # buffering; the struct-min is map-side combinable.
        labels = (
            votes.groupBy("v").agg(F.min(F.struct(
                (-F.col("n")).alias("_neg"),
                F.col("label").alias("_l"))).alias("_m"))
            .select(F.col("v").alias("node"), F.col("_m._l").alias("label"))
            .localCheckpoint()
        )
    return labels


def hits(
    edges: DataFrame, src: str = "src", dst: str = "dst", n_iter: int = 5,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg), `n_iter` fixed iterations
    with L1 normalization — deterministic given the edge set, so the
    oracle unrolls the identical recurrence in SQL:

        a_t(v) = sum_{u->v} h_{t-1}(u);   a_t /= sum(a_t)
        h_t(u) = sum_{u->v} a_t(v);       h_t /= sum(h_t)

    starting from h_0 = 1/N on every node. Returns (node, hub, auth)
    for every node (0.0 where a node has no out-/in-edges).

    Scale shape (100 TB): the pagerank discipline verbatim — the edge
    table is the fat side, joined once per half-step on its key against
    a node-sized score table (broadcast only under the OBSERVED node
    count, else shuffle; AQE reuses the exchange); each half-step's
    normalization constant rides its checkpoint via observe(), so
    normalizing is a projection, never an extra job; no driver-side
    node data."""
    from pyspark.sql import Observation

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .dropDuplicates(["src", "dst"]).localCheckpoint()
    obs_n = Observation()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .observe(obs_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_nodes = obs_n.get["n"]
    if n_nodes == 0:
        return nodes.withColumn("hub", F.lit(0.0)) \
            .withColumn("auth", F.lit(0.0))

    h = nodes.select("node", F.lit(1.0 / n_nodes).alias("h"))
    a_norm = None
    for _ in range(n_iter):
        obs_a = Observation()
        a_raw = (
            e.join(_side(h, n_nodes), h["node"] == e["src"])
            .groupBy("dst").agg(F.sum("h").alias("a"))
            .observe(obs_a, F.sum("a").alias("s"))
            .localCheckpoint()
        )
        sa = obs_a.get["s"] or 1.0  # nonempty e => sa > 0
        a_norm = a_raw.select(
            F.col("dst").alias("node"), (F.col("a") / F.lit(sa)).alias("a"))
        obs_h = Observation()
        h_raw = (
            e.join(_side(a_norm, n_nodes), a_norm["node"] == e["dst"])
            .groupBy("src").agg(F.sum("a").alias("hh"))
            .observe(obs_h, F.sum("hh").alias("s"))
            .localCheckpoint()
        )
        sh = obs_h.get["s"] or 1.0
        h = h_raw.select(
            F.col("src").alias("node"), (F.col("hh") / F.lit(sh)).alias("h"))
    return (
        nodes.join(h, "node", "left").join(a_norm, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
            F.coalesce("a", F.lit(0.0)).alias("auth"),
        )
    )


def k_core(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    k: int = 2, max_iter: int = 8,
) -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes whose
    undirected simple-graph degree is < k, `max_iter` fixed rounds.
    Peeling is IDENTITY once converged, so a fixed unroll restates
    exactly in SQL regardless of when the fixpoint lands; the Spark side
    may stop early on an observed fixpoint (output-identical). Returns
    (node, degree) for the surviving core, degree measured inside it.

    Scale shape (100 TB): per round one map-side-combined degree agg and
    two LEFT SEMI equi-joins of the (shrinking) edge set against the
    node-sized survivor table (broadcast only under the OBSERVED
    survivor count — the pagerank/coref discipline); each round's
    lineage is cut with a checkpoint whose counts ride observe(), so
    the early-exit test costs zero extra jobs. Integer-exact."""
    from pyspark.sql import Observation

    obs_e = Observation()
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .dropDuplicates(["a", "b"])
        .observe(obs_e, F.count(F.lit(1)).alias("m"))
        .localCheckpoint()
    )
    m_prev = obs_e.get["m"]
    for _ in range(max_iter):
        if m_prev == 0:
            break
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        )
        obs_n = Observation()
        alive = (
            deg.where(F.col("degree") >= k).select("node")
            .observe(obs_n, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        n_alive = obs_n.get["n"]
        side = F.broadcast(alive) if n_alive <= BROADCAST_RANKS_MAX else alive
        obs_m = Observation()
        e = (
            e.join(side.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(side.withColumnRenamed("node", "b"), "b", "left_semi")
            .observe(obs_m, F.count(F.lit(1)).alias("m"))
            .localCheckpoint()
        )
        m_now = obs_m.get["m"]
        if m_now == m_prev:  # fixpoint: further rounds are identity
            break
        m_prev = m_now
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    )


def bfs_distances(
    edges: DataFrame, seeds: list, src: str = "src", dst: str = "dst",
    max_hops: int = 6, directed: bool = False,
) -> DataFrame:
    """Multi-source BFS: shortest hop distance from any seed, bounded by
    `max_hops`. Fixed rounds with a min-relaxation recurrence

        dist_{t}(v) = min(dist_{t-1}(v), 1 + min_{u->v} dist_{t-1}(u))

    which is IDENTITY once all distances settle, so the oracle's fixed
    unroll matches the Spark side's observe()-gated early exit (the
    settled-count rides each round's checkpoint). Returns (node, dist)
    for every reached node; unreached nodes are absent (their distance
    is infinite, not a value). Integer-exact.

    Scale shape (100 TB): the frontier-relaxation join is the edge table
    against the node-sized distance table per round (broadcast only
    under the OBSERVED node count — the pagerank discipline); min-
    relaxation aggregates map-side. Unlike a frontier-only BFS, the
    full-relaxation form needs no anti-join against the visited set —
    the min() absorbs revisits — at the cost of joining settled nodes
    each round; for hop-bounded queries (the common 100 TB ask) the
    bound keeps rounds small."""
    from pyspark.sql import Observation

    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = half if directed else half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"]) \
        .localCheckpoint()
    spark = edges.sparkSession
    uniq_seeds = sorted(set(seeds))
    seed_df = spark.createDataFrame(
        [(s,) for s in uniq_seeds], f"node {dict(e.dtypes)['u']}")
    dist = seed_df.select("node", F.lit(0).alias("dist")).localCheckpoint()
    n_prev = len(uniq_seeds)
    for _ in range(max_hops):
        relax = (
            e.join(_side(dist.withColumnRenamed("node", "u"), n_prev), "u")
            .select(F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        obs = Observation()
        dist = (
            dist.unionByName(relax)
            .groupBy("node").agg(F.min("dist").alias("dist"))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        n_now = obs.get["n"]
        if n_now == n_prev:
            # fixpoint: in unit-weight min-relaxation a node's first
            # assigned value IS its true distance (induction on rounds),
            # so values never tighten after assignment — a stable reach
            # count means every further round is identity
            break
        n_prev = n_now
    return dist


def link_prediction(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    max_apex_degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Link prediction over the undirected simple graph: for every
    NON-adjacent unordered pair (a, b) sharing at least one common
    neighbor, emit the three classic structural scores

        common_neighbors = |N(a) ∩ N(b)|
        jaccard          = cn / (deg(a) + deg(b) - cn)
        adamic_adar      = Σ_{w ∈ N(a) ∩ N(b)} 1 / ln(deg(w))

    (Liben-Nowell & Kleinberg 2003). Scores are rounded to 6 places;
    `top_k` returns the global top pairs by (adamic_adar DESC,
    common_neighbors DESC, a, b) — a total order, so deterministic.

    The reference's graph store ranks entities only by mention counts
    (/root/reference/src/neo4j/models.py:100-159); predicting missing
    links is the canonical next analytics step over the same node/edge
    tables (e.g. suggesting probable-but-unextracted relations).

    Scale shape (100 TB edge table): candidate pairs enumerate through
    shared neighbors (apexes), and a degree-10^6 hub apex alone yields
    10^12 pairs — unlike triangle counting, the pair set itself is the
    OUTPUT, so degree-ordered orientation cannot absorb the skew.
    `max_apex_degree` is the standard lever: pairs are counted only
    through apexes with degree <= cap, bounding per-apex fan-out at
    cap^2 (Adamic-Adar already discounts hub apexes as 1/ln d, so the
    cap removes exactly the lowest-signal wedges; the cap is part of the
    operator's declared semantics and the oracle applies the same cap).
    All joins are equi-joins: the apex self-join shuffles on apex; the
    adjacency anti-join and the two degree attachments broadcast only
    under the observed edge/node counts (pagerank discipline)."""
    from pyspark.sql import Observation

    obs_e = Observation()
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .dropDuplicates(["a", "b"])
        .observe(obs_e, F.count(F.lit(1)).alias("m"))
        .localCheckpoint()  # adjacency, degrees and the anti-join reuse it
    )
    n_edges = obs_e.get["m"]
    obs_n = Observation()
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        .observe(obs_n, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # apex filter + two endpoint attachments
    )
    n_nodes = obs_n.get["n"]
    adj = e0.select(F.col("a").alias("apex"), F.col("b").alias("nb")) \
        .unionByName(
            e0.select(F.col("b").alias("apex"), F.col("a").alias("nb")))
    # a degree-1 apex has a single neighbor and forms no pair, so
    # dropping it is exact — and keeps the 1/ln(1) pole out of the
    # weight projection (ANSI mode evaluates it eagerly otherwise); the
    # weight attaches BEFORE the self-join so each wedge carries its
    # apex weight without a third scan of the degree table
    apex_deg = deg.select(F.col("node").alias("apex"), "degree") \
        .where(F.col("degree") >= 2)
    if max_apex_degree is not None:
        apex_deg = apex_deg.where(F.col("degree") <= max_apex_degree)
    adjd = adj.join(_side(apex_deg, n_nodes), "apex") \
        .select("apex", "nb", (1.0 / F.log(F.col("degree"))).alias("w")) \
        .localCheckpoint()  # self-join consumes it twice
    x, y = adjd.alias("x"), adjd.alias("y")
    pairs = (
        x.join(y, F.col("x.apex") == F.col("y.apex"))
        .where(F.col("x.nb") < F.col("y.nb"))
        .groupBy(F.col("x.nb").alias("a"), F.col("y.nb").alias("b"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"),
             F.sum(F.col("x.w")).alias("_aa"))
    )
    nonadj = pairs.join(
        F.broadcast(e0) if n_edges <= BROADCAST_EDGES_MAX else e0,
        ["a", "b"], "left_anti")
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_db"))
    scored = (
        nonadj.join(_side(da, n_nodes), "a").join(_side(db, n_nodes), "b")
        .select(
            "a", "b", "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("_da") + F.col("_db") - F.col("common_neighbors")),
                6).alias("jaccard"),
            F.round(F.col("_aa"), 6).alias("adamic_adar"),
        )
    )
    if top_k is not None:
        # orderBy+limit lowers to TakeOrderedAndProject: per-partition
        # top-k then a driver merge of k rows, never a global sort
        scored = scored.orderBy(
            F.col("adamic_adar").desc(), F.col("common_neighbors").desc(),
            F.col("a").asc(), F.col("b").asc()).limit(top_k)
    return scored


def sssp_weighted(
    edges: DataFrame, seeds: list, src: str = "src", dst: str = "dst",
    weight: str = "weight", max_hops: int = 8, directed: bool = False,
) -> DataFrame:
    """Weighted single/multi-source shortest paths (Bellman-Ford
    min-relaxation), bounded at `max_hops` edges:

        dist_t(v) = min(dist_{t-1}(v), min_{u->v} dist_{t-1}(u) + w(u,v))

    Returns (node, dist) = the cheapest path cost from any seed over
    paths of at most `max_hops` edges; unreached nodes are absent. With
    integral weights the result is integer-exact, and the hop bound
    makes the semantics well-defined on cyclic graphs without a
    negative-cycle proviso (weights are asserted non-negative by
    contract; parallel edges collapse to their min weight).

    The reference ranks graph entities only by mention counts
    (/root/reference/src/neo4j/models.py:100-159); cheapest-path
    proximity over weighted relation edges is the natural "how closely
    is A tied to B" query the store itself cannot answer.

    Scale shape (100 TB): identical to bfs_distances — one edge-vs-
    distance equi-join per round (distance side broadcast only under
    its OBSERVED count), min() aggregates map-side, lineage cut per
    round. Early exit rides the same checkpoint observe(): values only
    tighten, so an unchanged (count, sum) pair proves the fixpoint
    (sum of integral dists is exact in double well past 2^50), and
    settled rounds are identity — output stays identical to the
    oracle's fixed unroll.

    The (count, sum) proof needs INTEGRAL weights — with fractional
    weights a below-ulp tightening could leave the FP sum bit-equal
    before the true fixpoint — so integrality is detected from an
    observe() riding the edge-collapse checkpoint (no extra job) and
    non-integral graphs simply run all `max_hops` rounds, which is the
    oracle's fixed-unroll semantics anyway."""
    from pyspark.sql import Observation

    half = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).cast("double").alias("w"))
    e = half if directed else half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    obs_e = Observation()
    e = e.where(F.col("u") != F.col("v")) \
        .groupBy("u", "v").agg(F.min("w").alias("w")) \
        .observe(obs_e,
                 F.sum(F.when(F.col("w") != F.floor("w"), 1).otherwise(0))
                 .alias("frac"),
                 F.min("w").alias("minw")) \
        .localCheckpoint()
    got_e = obs_e.get
    # r6 (ADVICE r5): the non-negative-weight contract is now ENFORCED —
    # min(w) rides the same observe (zero extra jobs); a negative weight
    # would silently yield hop-bounded non-shortest-path results and
    # could trip the (count, sum) early exit mid-relaxation
    if got_e["minw"] is not None and got_e["minw"] < 0:
        raise ValueError(
            f"sssp_weighted requires non-negative weights "
            f"(min weight = {got_e['minw']})")
    integral_weights = (got_e["frac"] or 0) == 0
    spark = edges.sparkSession
    uniq_seeds = sorted(set(seeds))
    seed_df = spark.createDataFrame(
        [(s,) for s in uniq_seeds], f"node {dict(e.dtypes)['u']}")
    dist = seed_df.select("node", F.lit(0.0).alias("dist")).localCheckpoint()
    prev = (len(uniq_seeds), 0.0)
    for _ in range(max_hops):
        relax = (
            e.join(_side(dist.withColumnRenamed("node", "u"), prev[0]), "u")
            .select(F.col("v").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"))
        )
        obs = Observation()
        dist = (
            dist.unionByName(relax)
            .groupBy("node").agg(F.min("dist").alias("dist"))
            .observe(obs, F.count(F.lit(1)).alias("n"),
                     F.sum("dist").alias("s"))
            .localCheckpoint()
        )
        got = obs.get
        now = (got["n"], got["s"])
        if integral_weights and now == prev:
            break
        prev = now
    return dist
