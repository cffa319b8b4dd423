"""Deduplication operators for training-data pipelines.

Five dedup families, ALL driver-oracle-checked (r2: the former rows-only
entries gained hard oracles — minhash verifies to the exact Jaccard SQL,
simhash is re-stated bit-for-bit in DuckDB SQL):

- exact:        hash-groupBy on the normalized-content fingerprint
- ngram-jaccard: word-shingle inverted index -> pair Jaccard (exact)
- minhash-lsh:  shingles -> HashingTF -> MinHashLSH banding -> candidate
                pairs -> EXACT shingle-Jaccard verify (the 100 TB scale
                path: candidates ~ O(near-dups), not O(n^2))
- simhash:      64-bit token-hash bit-majority signature; distinct
                signatures band-blocked (16-bit x4, pigeonhole-exact for
                Hamming <= 3), hot buckets sub-split by 12-bit sub-bands
- embedding:    cosine >= threshold pairs via random-hyperplane LSH-bucket
                blocking + exact-cosine verify

Scale notes: pair generation is always blocked (shared shingle / LSH
bucket / simhash band), never a cross join; blocking keys are
frequency-capped or signature-collapsed so a ubiquitous key cannot
quadratically explode a partition (the same guard discipline as
canonicalize.TOKEN_DF_CAP).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..partitioning import repartition_compute, repartition_wide
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

    Pure Catalyst, zip-shift construction: transform over the first
    n-K+1 words, pulling the K-1 following words with O(1) element_at.
    The obvious per-index `slice(words, i+1, K)` form was measured 10x
    slower (per-element slice work inside the higher-order transform);
    output is set-identical (asserted at every sf in tests)."""
    K = SHINGLE_K
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    w = F.col("_w")
    sh = F.transform(
        F.slice(w, 1, F.greatest(F.size(w) - (K - 1), F.lit(1))),
        lambda x, i: F.concat_ws(
            " ", x, *[F.element_at(w, i + 1 + j) for j in range(1, K)]))
    return (
        # the shingle explode is the corpus's heaviest projection and
        # sits directly on a small-file scan: widen first (r6,
        # partitioning.repartition_compute note)
        repartition_compute(docs).withColumn("_w", words)
        .where(F.size(w) >= K)
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
    # fan-out join: pin full width (see partitioning.repartition_wide)
    sh_b = repartition_wide(sh.join(rare, "shingle"), "shingle")
    a, b = sh_b.alias("a"), sh_b.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # filter on the UNROUNDED ratio (parity with the SQL oracle, ADVICE r1);
    # round only the reported column
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _jaccard_verify(
    cand: DataFrame, sh: DataFrame, threshold: float, df_cap: int,
    rare: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard for a given candidate-pair set (doc_a, doc_b):
    the shared verify stage of both the inverted-index and the MinHash-LSH
    path — identical formula (df-capped intersection over full sizes) so
    both match the same SQL oracle value-for-value. `rare` (the df-capped
    shingle list) defaults to df over `sh` itself; the minhash path passes
    a full-corpus df computed over distinct contents x group sizes."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if rare is None:
        rare = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= df_cap).select("shingle")
        )
    shb = sh.join(rare, "shingle")
    inter = (
        cand.join(shb.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(shb.select(F.col("doc_id").alias("doc_b"), "shingle"),
              ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def benchmark_contamination(
    docs: DataFrame, benchmark: DataFrame, threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Decontamination scan (the eval-leakage guard every pretraining
    pipeline runs before training): per document, the fraction of its
    DISTINCT K-word shingles that occur anywhere in the benchmark corpus,
    plus a `contaminated` flag at `threshold`.

    Scale shape: the benchmark shingle set is deduplicated and met with a
    LEFT SEMI join — no row expansion however hot a shingle is, so no
    df-cap is needed; benchmark corpora are small (eval sets), so the
    semi join broadcasts under AQE, leaving one scan + one partial-agg
    over the training corpus. Docs shorter than K words score 0.0
    (nothing to leak). The flag is computed on the UNROUNDED fraction
    (oracle parity); only the reported column is rounded."""
    d_sh = _shingles(docs, text_col)
    b_sh = _shingles(benchmark, text_col).select("shingle").distinct()
    sizes = d_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        d_sh.join(b_sh, "shingle", "left_semi")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit"))
    )
    frac = F.coalesce(F.col("n_hit") / F.col("n_sh"), F.lit(0.0))
    return (
        docs.select("doc_id")
        .join(sizes, "doc_id", "left").join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_sh", F.lit(0)).cast("long").alias("n_sh"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(frac, 6).alias("contamination"),
            (frac >= threshold).alias("contaminated"),
        )
    )


MINHASH_TABLES = 12


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text",
    num_hash_tables: int = MINHASH_TABLES, df_cap: int = SHINGLE_DF_CAP,
    as_groups: bool = False,
) -> DataFrame:
    """Near-dup pairs at exact df-capped shingle-Jaccard >= threshold,
    computed over DISTINCT normalized contents (rep level) and expanded
    back to doc pairs. The declared contract (and the SQL oracle) is the
    EXACT pair set — identical to ngram_jaccard_pairs restricted to reps
    with the full-corpus df cap — so candidate generation must have
    exact recall.

    r6 OPTIMIZATION NOTE: rep-pair generation now runs the rare-postings
    inverted self-join directly (see the inline comment at the call
    site). The previous r=1 x H=12 minhash banding
    (_minhash_candidates, kept for sub-exact-recall contracts) is
    dominated under an exact-recall contract: at j=0.5 exact recall
    forces single-row bands, single-row bands collide on hot
    min-shingles (measured 12M candidates for 2,426 true pairs at 50k
    reps), and each candidate pays a full posting-list expansion in the
    verify join. The postings join is the same work ngram_jaccard_pairs
    does, bounded by df_cap x |postings| regardless of corpus skew.

    Duplicate-heavy guard (VERDICT r2 #1): web corpora are dominated by
    byte-identical copies, and identical docs share ALL band values — so
    banding raw doc_ids makes every N-clone group contribute N rows per
    band and N^2 candidate rows EACH paying the shingle-join verify.
    Instead banding runs over DISTINCT normalized contents (the reps from
    exact_duplicates' fingerprint groups — fingerprints() normalizes with
    the same lower/trim/\\s+ rule as _shingles, so same fingerprint <=>
    same shingle set): verify cost is O(rep pairs). Rep pairs then expand
    to member doc pairs by two fingerprint equi-joins, and within-group
    pairs get the group's self-Jaccard analytically — output identical to
    banding the raw docs (the oracle is unchanged), but candidate work no
    longer scales with clone counts. The df-cap stays FULL-corpus exact:
    df(shingle) = sum of group sizes over reps containing it.

    Group mode (VERDICT r3 #4): the all-pairs OUTPUT is itself O(clone^2)
    by contract — a 1M-clone group emits 5*10^11 rows even though the
    candidate work is O(reps). `as_groups=True` instead returns a linear
    (record_type, id_a, id_b, score) table:
    - 'rep_pair' rows: near-dup pairs BETWEEN group representatives
      (id_a/id_b = rep doc ids, score = their exact jaccard);
    - 'member'  rows: one per document (id_a = its group rep, id_b = the
      doc, score = the group's within-group jaccard when the group has
      >=2 docs and clears the threshold, else null).
    The full pair set reconstructs exactly (pinned in pytest): cross
    pairs = rep_pair x member expansion on both ends at the rep pair's
    score; within pairs = member pairs of any group whose member score is
    non-null, at that score. Pairs mode stays the oracle contract."""
    fp = fingerprints(docs, text_col)
    # feeds rep selection, full-df reconstruction, and both expansions
    groups = (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("rep_doc_id"),
             F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )
    members = fp.join(groups, "fingerprint").select("doc_id", "rep_doc_id")
    rep_docs = docs.join(
        groups.select(F.col("rep_doc_id").alias("doc_id")), "doc_id", "left_semi")
    # the rep shingle table feeds the signature agg, sizes, df and verify
    # join; materialize once so the explode doesn't recompute per branch
    sh = _shingles(rep_docs, text_col).localCheckpoint()
    df_full = (
        sh.join(groups.select(F.col("rep_doc_id").alias("doc_id"), "n_docs"),
                "doc_id")
        .groupBy("shingle").agg(F.sum("n_docs").alias("df"))
    )
    rare = df_full.where(F.col("df") <= df_cap).select("shingle")

    # r6 OPTIMIZATION (guide §2.3/§3): rep pairs come straight from the
    # rare-postings self-join (the ngram_jaccard_pairs discipline, with
    # the full-corpus df as the rare set) instead of minhash banding +
    # per-candidate verify. Rationale, measured at 50k reps / 2.6M
    # postings (sf1.0): the r=1 x H=12 banding admits every pair whose
    # min-hash collides in ANY table — 12M candidate pairs for 2,426
    # true pairs — and each candidate pays a ~n_sh-row expansion in the
    # verify join (~620M rows, 307 s). The postings join computes every
    # pair's capped intersection directly in ~127M narrow rows with NO
    # expansion. Output is identical BY CONSTRUCTION: the operator's
    # declared contract (and SQL oracle) is the exact df-capped-Jaccard
    # pair set, any qualifying pair shares >= 1 rare shingle (n_inter
    # >= 1), and the jaccard formula below is verbatim _jaccard_verify's.
    # Banding with r>1 rows/band is the genuine MinHash trade (fewer
    # candidates for sub-exact recall) and stays available via
    # _minhash_candidates for contracts that accept it; under an
    # exact-recall contract it is dominated (r=1 bands collide on hot
    # min-shingles, and per-candidate verify costs ~2x the doc's full
    # posting list). The explicit full-width repartition pins the
    # fan-out join against AQE coalescing (partitioning module note).
    shb = repartition_wide(sh.join(rare, "shingle"), "shingle")
    inter = (
        shb.alias("a").join(shb.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    vjac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    rep_pairs = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .where(vjac >= threshold)
        .select("doc_a", "doc_b", F.round(vjac, 6).alias("jaccard"))
    )

    # within-group score: two identical docs score
    # n_capped / (2*n_sh - n_capped) under the df-capped formula (hot
    # shingles drop out of the intersection but not the sizes) — computed
    # once per group
    capped = sh.join(rare, "shingle").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_capped"))
    wjac = F.col("n_capped") / (2 * F.col("n_sh") - F.col("n_capped"))
    wg = (
        groups.where(F.col("n_docs") >= 2)
        .join(sizes.select(F.col("doc_id").alias("rep_doc_id"), "n_sh"),
              "rep_doc_id")
        .join(capped.select(F.col("doc_id").alias("rep_doc_id"), "n_capped"),
              "rep_doc_id")
        .where(wjac >= threshold)
        .select("rep_doc_id", F.round(wjac, 6).alias("jaccard"))
    )

    if as_groups:
        rep_out = rep_pairs.select(
            F.lit("rep_pair").alias("record_type"),
            F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"),
            F.col("jaccard").alias("score"))
        member_out = members.join(wg, "rep_doc_id", "left").select(
            F.lit("member").alias("record_type"),
            F.col("rep_doc_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.col("jaccard").alias("score"))
        return rep_out.unionByName(member_out)

    # cross-group expansion: members inherit their rep's shingle set, so
    # the pair Jaccard is the rep pair's value verbatim
    ma = members.select(F.col("rep_doc_id").alias("doc_a"), F.col("doc_id").alias("da"))
    mb = members.select(F.col("rep_doc_id").alias("doc_b"), F.col("doc_id").alias("db"))
    cross = (
        rep_pairs.join(ma, "doc_a").join(mb, "doc_b")
        .select(F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"), "jaccard")
    )
    within = (
        wg.join(members.alias("x"), "rep_doc_id")
        .join(members.alias("y"), "rep_doc_id")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"), "jaccard")
    )
    return cross.unionByName(within)


def _minhash_candidates(sh: DataFrame, num_hash_tables: int) -> DataFrame:
    """Banding stage over a (doc_id, shingle) table: H min-hash bands in one
    groupBy, posexplode, equi-self-join. Split out so the skew pytest can
    assert candidate-row counts directly."""
    sig = sh.groupBy("doc_id").agg(F.array(*[
        F.min(F.xxhash64("shingle", F.lit(i))) for i in range(num_hash_tables)
    ]).alias("mh"))
    blocked = sig.select(
        "doc_id", F.posexplode("mh").alias("table", "h"))
    a = blocked.select(F.col("doc_id").alias("doc_a"), "table", "h")
    b = blocked.select(F.col("doc_id").alias("doc_b"), "table", "h")
    return (
        a.join(b, ["table", "h"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


@F.pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash: per-token md5-derived 64-bit hashes, bitwise
    majority vote.

    r6 OPTIMIZATION (guide §4.2): same signature bit-for-bit, computed
    vectorized — token md5s are memoized across the whole batch (Zipf:
    most occurrences are repeats), the per-bit majority is one numpy
    broadcast + reduction instead of a 64-iteration Python loop per
    token, and the two's-complement fold is a uint64 view. The old
    row-at-a-time form cost ~64 Python ops per token occurrence.
    Majority test: acc[bit] = ones - (n - ones) > 0  <=>  2*ones > n,
    integer-exact."""
    import numpy as np

    memo: dict = {}
    bitpos = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = set((text or "").lower().split())
        if not toks:
            continue
        hs = np.empty(len(toks), dtype=np.uint64)
        for j, tok in enumerate(toks):
            h = memo.get(tok)
            if h is None:
                h = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big")
                memo[tok] = h
            hs[j] = h
        ones = ((hs[:, None] >> bitpos) & np.uint64(1)).sum(axis=0)
        maj = (2 * ones) > len(toks)
        out[i] = (maj.astype(np.uint64) << bitpos).sum(
            dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # compute-heavy UDF over a small file scan: widen first
    # (partitioning.repartition_compute note)
    return repartition_compute(docs).select(
        "doc_id", _simhash_udf(F.col(text_col)).alias("simhash"))


# Max DISTINCT signatures per (band, value) bucket before the bucket is
# sub-split (the TOKEN_DF_CAP analog for the band join — VERDICT r1: one
# hot band must not quadratically explode).
SIMHASH_BAND_CAP = 200


def _band16(col, i: int):
    return F.shiftrightunsigned(col, i * 16).bitwiseAND(F.lit(0xFFFF))


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text",
    band_cap: int = SIMHASH_BAND_CAP, as_groups: bool = False,
) -> DataFrame:
    """Near-dups by Hamming(simhash) <= 3, exact and skew-proof:

    1. collapse identical signatures — candidate generation runs over
       DISTINCT signatures, so a million byte-identical (or near-empty,
       simhash=0) documents contribute ONE blocking row, not 10^12 pairs;
       their doc-level pairs are re-expanded at the end (genuine output).
    2. 16-bit band blocking over distinct signatures (pigeonhole:
       hamming<=3 across 4 bands => >=1 band identical — exact recall).
    3. hot-bucket refinement: a (band, value) bucket holding more than
       band_cap distinct signatures is not pair-joined directly; its rows
       are re-keyed by 12-bit sub-bands of the OTHER 48 bits (pigeonhole
       again: <=3 differing bits across 4 sub-bands => >=1 sub-band
       identical), cutting the bucket quadratics by ~2^12 while keeping
       exactness.

    Group mode (VERDICT r3 #4): `as_groups=True` returns the linear
    (record_type, id_a, id_b, score) form instead of all doc pairs —
    'rep_pair' rows are signature-group representative pairs (score =
    hamming as double), 'member' rows map each doc to its signature
    group's rep (score = 0.0: identical signatures). The pair set
    reconstructs exactly (pytest); pairs mode stays the oracle contract.
    """
    sig = simhash_signatures(docs, text_col).localCheckpoint()
    sigs = sig.select("simhash").distinct()

    bands = sigs.select(
        "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band_i"), _band16(F.col("simhash"), i).alias("band_v"))
            for i in range(4)
        ])).alias("b"),
    ).select("simhash", F.col("b.band_i").alias("band_i"), F.col("b.band_v").alias("band_v"))

    counts = bands.groupBy("band_i", "band_v").agg(F.count(F.lit(1)).alias("n"))
    bands = bands.join(counts, ["band_i", "band_v"])
    cold = bands.where(F.col("n") <= band_cap).drop("n")
    hot = bands.where(F.col("n") > band_cap).drop("n")

    def _pair_join(blocked: DataFrame, keys: list[str]) -> DataFrame:
        a = blocked.select(F.col("simhash").alias("sh_a"), *keys)
        b = blocked.select(F.col("simhash").alias("sh_b"), *keys)
        return (
            a.join(b, keys)
            .where(F.col("sh_a") < F.col("sh_b"))
            .select("sh_a", "sh_b")
        )

    cand = _pair_join(cold, ["band_i", "band_v"])

    # sub-split hot buckets: remainder = the other 48 bits (band_i removed),
    # re-banded into 4 x 12-bit sub-bands, as a single CASE over band_i
    low_mask = [F.lit((1 << (16 * i)) - 1) for i in range(4)]
    rem = None
    for i in range(4):
        low = F.col("simhash").bitwiseAND(low_mask[i])
        if i < 3:
            # JVM shifts are mod 64, so the i=3 "high part" (>>64) must be
            # omitted, not computed
            expr = low.bitwiseOR(F.shiftleft(
                F.shiftrightunsigned(F.col("simhash"), 16 * (i + 1)), 16 * i))
        else:
            expr = low
        rem = F.when(F.col("band_i") == i, expr) if rem is None \
            else rem.when(F.col("band_i") == i, expr)
    hot_sub = hot.select(
        "simhash", "band_i", "band_v",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("sub_i"),
                F.shiftrightunsigned(rem, 12 * j).bitwiseAND(F.lit(0xFFF)).alias("sub_v"))
            for j in range(4)
        ])).alias("s"),
    ).select("simhash", "band_i", "band_v",
             F.col("s.sub_i").alias("sub_i"), F.col("s.sub_v").alias("sub_v"))
    cand = cand.unionByName(
        _pair_join(hot_sub, ["band_i", "band_v", "sub_i", "sub_v"]))

    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    sig_pairs = (
        cand.dropDuplicates(["sh_a", "sh_b"])
        .where(hamming <= max_hamming)
        .select("sh_a", "sh_b", hamming.alias("hamming"))
    )

    if as_groups:
        reps = sig.groupBy("simhash").agg(F.min("doc_id").alias("rep_doc_id"))
        ra = reps.select(F.col("simhash").alias("sh_a"),
                         F.col("rep_doc_id").alias("rep_a"))
        rb = reps.select(F.col("simhash").alias("sh_b"),
                         F.col("rep_doc_id").alias("rep_b"))
        rep_out = sig_pairs.join(ra, "sh_a").join(rb, "sh_b").select(
            F.lit("rep_pair").alias("record_type"),
            F.least("rep_a", "rep_b").alias("id_a"),
            F.greatest("rep_a", "rep_b").alias("id_b"),
            F.col("hamming").cast("double").alias("score"))
        member_out = sig.join(reps, "simhash").select(
            F.lit("member").alias("record_type"),
            F.col("rep_doc_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.lit(0.0).alias("score"))
        return rep_out.unionByName(member_out)

    # expand distinct-signature pairs back to doc pairs (genuine output)
    da = sig.select(F.col("simhash").alias("sh_a"), F.col("doc_id").alias("doc_a"))
    db = sig.select(F.col("simhash").alias("sh_b"), F.col("doc_id").alias("doc_b"))
    cross = sig_pairs.join(da, "sh_a").join(db, "sh_b").select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"), "hamming")
    same = (
        sig.alias("x").join(sig.alias("y"), F.col("x.simhash") == F.col("y.simhash"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"),
                F.lit(0).cast("int").alias("hamming"))
    )
    return cross.unionByName(same.select("doc_a", "doc_b", F.col("hamming")))


EMB_LSH_PLANES = 4
EMB_LSH_TABLES = 16


def deduplicate_corpus(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Terminal keep-one dedup — the materialization every pretraining
    pipeline actually wants (the cleaned corpus, not a pair list):
    byte-identical documents always merge (fingerprint groups), near-dups
    merge at `threshold` (MinHash-LSH + exact verify), merged clusters
    collapse via connected components, and the component's minimum doc_id
    is the keeper.

    Scale shape: the near-dup graph is built at REP level (group-mode
    minhash — O(rep pairs) edges, clone counts never expand), components
    run over rep ids only (large-star/small-star, component = min id),
    and members attach back by one equi-join — so a 1M-clone group costs
    one CC vertex and 10^6 join rows, never 5*10^11 pairs.

    Returns (doc_id, group_rep, keep): group_rep = min doc_id of the
    document's duplicate cluster (= itself for uniques), keep = this doc
    IS the cluster representative. `docs.join(out.where("keep"),
    "doc_id", "left_semi")` is the deduplicated corpus."""
    from .components import connected_components

    grp = minhash_lsh_pairs(docs, threshold, text_col, as_groups=True,
                            **kwargs)
    members = grp.where(F.col("record_type") == "member").select(
        F.col("id_a").alias("rep"), F.col("id_b").alias("doc_id"))
    rep_pairs = grp.where(F.col("record_type") == "rep_pair").select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(rep_pairs)
    labeled = members.join(comp, members["rep"] == comp["id"], "left").select(
        "doc_id", F.coalesce(comp["component"], members["rep"])
        .alias("group_rep"))
    return labeled.select(
        "doc_id", "group_rep",
        (F.col("doc_id") == F.col("group_rep")).alias("keep"))


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95,
    n_planes: int = EMB_LSH_PLANES, n_tables: int = EMB_LSH_TABLES,
    dim: int | None = None,
) -> DataFrame:
    """Cosine >= threshold pairs over (vec_id, embedding array<float>):
    random-hyperplane LSH-bucket blocking (similarity.lsh_buckets_multi_udf)
    + exact-cosine verify — the scale path (VERDICT r1: replaces the O(n^2)
    BroadcastNestedLoop theta-join).

    Plan shape: one Arrow pass emits all B bucket ids per vector,
    posexplode -> ONE equi-self-join on (table, bucket) over an ids-only
    projection, dedup candidate pairs, then re-join the two vectors and
    verify with the exact JVM-side cosine. Candidate cost ~ sum of squared
    bucket sizes / 2; buckets = 2^n_planes per table, so n_planes is the
    knob that grows with corpus size. Recall per pair = 1 - (1 - p^P)^T
    with p = 1 - acos(cos)/pi; defaults (P=4, T=16) find every >=0.5 pair
    of the test corpus in >=2 tables (verified offline; planes are
    deterministic, so that is a guarantee, not a sample). The all-pairs
    exact path is kept as embedding_near_dup_exact (test oracle)."""
    from .similarity import cosine_expr, lsh_buckets_multi_udf

    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    if dim is None:
        # ArrayType carries no width, so the fallback probes one row — ONE
        # extra job per call. Callers know their embedding dimension; pass
        # it to keep plan construction job-free (VERDICT r3 #7).
        dim = len(emb.select("embedding").first()[0])
    udf = lsh_buckets_multi_udf(dim, n_planes, n_tables)
    blocked = emb.select(
        "vec_id", F.posexplode(udf(F.col("embedding"))).alias("table", "bucket"))
    a = blocked.select(F.col("vec_id").alias("id_a"), "table", "bucket")
    b = blocked.select(F.col("vec_id").alias("id_b"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    cos = cosine_expr(F.col("e_a"), F.col("e_b"))
    return (
        cand.join(ea, "id_a").join(eb, "id_b")
        .select("id_a", "id_b", cos.alias("_cos"))
        # unrounded filter (oracle parity, ADVICE r1); round only the output
        .where(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )


def deduplicate_embeddings(
    embeddings: DataFrame, threshold: float = 0.95,
    n_planes: int = EMB_LSH_PLANES, n_tables: int = EMB_LSH_TABLES,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic keep-one dedup over an embedding column:
    cosine >= threshold pairs (LSH-blocked + exact verify), clusters via
    large-star/small-star connected components, min vec_id keeps — the
    embedding-space analog of deduplicate_corpus, used by pretraining
    pipelines to drop semantic near-copies that text dedup misses.

    Returns (vec_id, group_rep, keep)."""
    from .components import connected_components

    pairs = embedding_near_dup_pairs(
        embeddings, threshold, n_planes, n_tables, dim=dim)
    comp = connected_components(pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    ids = embeddings.select("vec_id")
    labeled = ids.join(comp, ids["vec_id"] == comp["id"], "left").select(
        "vec_id",
        F.coalesce(comp["component"], ids["vec_id"]).alias("group_rep"))
    return labeled.select(
        "vec_id", "group_rep",
        (F.col("vec_id") == F.col("group_rep")).alias("keep"))


def embedding_near_dup_exact(
    embeddings: DataFrame, threshold: float = 0.95,
) -> DataFrame:
    """All-pairs exact variant (O(n^2) theta-join) — TEST ORACLE ONLY; the
    production path is embedding_near_dup_pairs."""
    from .similarity import cosine_expr

    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("e_a"), F.col("e_b"))
    return (
        pairs.select("id_a", "id_b", cos.alias("_cos"))
        .where(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )


def duplicate_spans(
    docs: DataFrame, text_col: str = "text", k: int = 5, min_docs: int = 2,
) -> DataFrame:
    """Exact duplicate-passage detection (the suffix-array substring-dedup
    shape of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", re-expressed relationally): every maximal token span
    whose every k-token window also appears in >= `min_docs` distinct
    documents. The span manifest is what a removal pass consumes — unlike
    doc-level near-dup (minhash/simhash), this catches boilerplate
    passages embedded in otherwise-unique documents.

    Output: (doc_id, span_no, span_start, span_end, span_tokens,
    n_windows) with 1-based token positions, span_no ordering spans
    within a doc. Integer-exact, so the SQL oracle must agree bit-for-bit.

    Scale shape (100 TB): positional k-gram windows are emitted in one
    projection (zip-shift concat, no per-window slice); the duplicated-
    window set is a hash agg keyed on the window text (distinct
    (doc, window) first, so a window repeated inside one doc does not
    fake corpus-level duplication); marking is a LEFT SEMI equi-join on
    the window key (linear, no fan-out — a window shared by 10^6 docs is
    one row on the build side); span merge is a per-doc gaps-and-islands
    window (partition by doc_id — bounded by doc length, never corpus-
    skewed). No cross joins, no driver-side data.

    Reference parity note: the reference dedups at whole-document level
    only (content-hash node MERGE, /root/reference/src/neo4j/models.py);
    passage-level dedup is part of the training-data surface this engine
    adds on top."""
    from pyspark.sql.window import Window

    w = F.col("_w")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sh = F.transform(
        F.slice(w, 1, F.greatest(F.size(w) - (k - 1), F.lit(1))),
        lambda x, i: F.concat_ws(
            " ", x, *[F.element_at(w, i + 1 + j) for j in range(1, k)]))
    pos_windows = (
        repartition_compute(docs).withColumn("_w", words)
        .where(F.size(w) >= k)
        .select("doc_id", F.posexplode(sh).alias("_p0", "window"))
        .select("doc_id", (F.col("_p0") + 1).alias("pos"), "window")
    )
    dup_set = (
        pos_windows.select("doc_id", "window").distinct()
        .groupBy("window").agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("window")
    )
    # the positional-window explode is ~k x the corpus tokens behind a
    # small shuffle: pin the per-doc window's width (partitioning note)
    hits = repartition_wide(
        pos_windows.join(dup_set, "window", "left_semi"), "doc_id")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(wd)
    new_island = F.when(
        prev.isNull() | (F.col("pos") > prev + k), F.lit(1)).otherwise(F.lit(0))
    islands = hits.withColumn(
        "_isl", F.sum(new_island).over(
            wd.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        islands.groupBy("doc_id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            F.col("_isl").cast("int").alias("span_no"),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int").alias("span_tokens"),
            F.col("n_windows").cast("long").alias("n_windows"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame, text_col: str = "text", k: int = 5, min_docs: int = 2,
) -> DataFrame:
    """Apply the duplicate_spans manifest: emit the corpus with every
    flagged span's tokens removed (the conservative remove-everywhere
    policy — a keep-one policy is a downstream choice over the same
    manifest; documented, deterministic).

    Output: (doc_id, n_tokens, n_removed, cleaned_text) for EVERY input
    document — n_tokens the original (whitespace, empty-filtered) token
    count, cleaned_text '' when a doc is entirely duplicated passage.

    Scale shape (100 TB): covered positions explode from the span
    manifest (manifest-sized, tiny next to the corpus); tokens LEFT ANTI
    the covered set on (doc_id, pos) — an equi-join, partitionable on
    doc_id; reassembly is one per-doc agg (collect_list is bounded by
    doc length, the same per-doc bound every text op here lives with).
    Integer/string-exact, so the SQL oracle must agree bit-for-bit."""
    w = F.col("_w")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = (
        repartition_compute(docs).withColumn("_w", words)
        .select("doc_id", F.posexplode(w).alias("_p0", "tok"))
        .where(F.col("tok") != "")
        .select("doc_id", (F.col("_p0") + 1).alias("pos"), "tok")
    )
    # r6 OPTIMIZATION: removal only needs the covered POSITION SET, and
    # the union over merged islands of [span_start, span_end] equals
    # the union over duplicated hit windows of [pos, pos+k-1] — so the
    # covered set comes straight from the LEFT SEMI'd positional
    # windows (the same dup_set/hits stages duplicate_spans runs),
    # skipping the gaps-and-islands window, the span aggregate and its
    # re-explode. Identical output by construction.
    wexpr = F.transform(
        F.slice(w, 1, F.greatest(F.size(w) - (k - 1), F.lit(1))),
        lambda x, i: F.concat_ws(
            " ", x, *[F.element_at(w, i + 1 + j) for j in range(1, k)]))
    pos_windows = (
        repartition_compute(docs).withColumn("_w", words)
        .where(F.size(w) >= k)
        .select("doc_id", F.posexplode(wexpr).alias("_p0", "window"))
        .select("doc_id", (F.col("_p0") + 1).alias("pos"), "window")
    )
    dup_set = (
        pos_windows.select("doc_id", "window").distinct()
        .groupBy("window").agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("window")
    )
    hits = pos_windows.join(dup_set, "window", "left_semi")
    # no distinct: LEFT ANTI is insensitive to duplicate build keys
    covered = hits.select(
        "doc_id",
        F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("pos"))
    kept = repartition_wide(
        toks.join(covered, ["doc_id", "pos"], "left_anti"), "doc_id")
    # r6: n_tokens is a projection (size of the empty-filtered split),
    # not an explode + groupBy — one fewer corpus shuffle; greatest/
    # coalesce guard the null-text row (size(NULL) is NULL under ANSI,
    # -1 under the legacy flag; the old explode path yielded 0)
    n_orig = docs.select(
        "doc_id",
        F.greatest(F.lit(0), F.coalesce(
            F.size(F.filter(words, lambda x: x != "")), F.lit(0)))
        .alias("n_tokens"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
            lambda s: s["tok"])).alias("cleaned_text"),
    )
    return (
        n_orig.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long").alias("n_removed"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def edit_distance_pairs(
    words: DataFrame, word_col: str = "word", max_len: int = 40,
) -> DataFrame:
    """All unordered pairs of distinct words at Levenshtein distance
    <= 1 (the typo/variant-detection primitive of fuzzy dedup), found by
    DELETION-NEIGHBORHOOD blocking [Bocek et al. 2007, "fastss"]: every
    word emits itself plus each single-character deletion; two words are
    within distance 1 iff they share a variant (substitution -> same
    deletion position, insert/delete -> one side's deletion equals the
    other), so an equi-join on the variant enumerates exactly the
    candidates and an exact levenshtein() confirms — never a cross
    join. Output (word_a, word_b, dist), word_a < word_b.

    Scale shape (10^9-word vocab): candidate generation is a linear
    explode bounded by word length (`max_len` guards pathological
    tokens); the variant equi-join shuffles on the variant string;
    per-variant groups are bounded by alphabet size in practice. The
    confirm filter is whole-stage-codegen levenshtein on candidate
    pairs only."""
    w = (
        words.select(F.col(word_col).cast("string").alias("w"))
        .where((F.col("w") != "") & (F.length("w") <= max_len))
        .dropDuplicates(["w"])
    )
    variants = w.select(
        "w",
        F.explode(F.concat(
            F.array(F.col("w")),
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.concat(
                    F.substring(F.col("w"), F.lit(1), i - 1),
                    F.col("w").substr(i + 1, F.length("w"))))))
        .alias("v"))
    a = variants.select(F.col("w").alias("word_a"), "v")
    b = variants.select(F.col("w").alias("word_b"), "v")
    return (
        a.join(b, "v")
        .where(F.col("word_a") < F.col("word_b"))
        .dropDuplicates(["word_a", "word_b"])
        .withColumn("dist", F.levenshtein("word_a", "word_b"))
        .where(F.col("dist") <= 1)
        .select("word_a", "word_b", "dist")
    )
