"""Training-data operators: dedup families, similarity search, text
analysis, multimodal plumbing — small planted cases with known answers."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from legal_knowledge_graph_spark.operators.dedup import (
    embedding_near_dup_pairs, exact_duplicates, minhash_lsh_pairs,
    ngram_jaccard_pairs, simhash_near_dup_pairs, simhash_signatures,
)
from legal_knowledge_graph_spark.operators.multimodal import (
    extract_features, sample_frames, synthetic_assets,
)
from legal_knowledge_graph_spark.operators.similarity import (
    knn_bruteforce, knn_lsh,
)
from legal_knowledge_graph_spark.operators.text_analysis import (
    language_id, quality_scores, token_counts, winnow_fingerprints,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog in the river of stars near the bank"),
    (1, "the quick brown fox jumps over the lazy dog in the river of stars near the bend"),  # near-dup of 0
    (2, "completely different text about spark and distributed query engines"),
    (3, "The Quick  Brown fox jumps over the lazy dog in the river of stars near the bank"),  # exact dup of 0 (normalized)
    (4, "der hund und die katze das ist ein test und nicht mehr zu sagen"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].rep_doc_id == 0 and groups[0].n_docs == 2


def test_ngram_jaccard(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    assert (0, 2) not in pairs


def test_minhash_lsh_finds_planted_dups(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in
             minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs and (0, 1) in pairs
    assert (0, 2) not in pairs


def test_simhash(spark, docs):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[3]  # identical token sets -> identical simhash
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in simhash_near_dup_pairs(docs, max_hamming=10).collect()}
    assert pairs[(0, 3)] == 0
    assert (0, 1) in pairs  # one word differs -> small hamming


def test_embedding_near_dup_and_knn(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7071, 0.7071, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    nd = {(r.id_a, r.id_b) for r in
          embedding_near_dup_pairs(emb, threshold=0.95).collect()}
    assert nd == {(0, 1)}

    knn = knn_bruteforce(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
        [0], k=3).collect()
    order = [r.neighbor_id for r in sorted(knn, key=lambda r: r.rank)]
    # numpy oracle
    arr = {i: np.array(v) for i, v in vecs}
    cos = {j: float(arr[0] @ arr[j] / (np.linalg.norm(arr[0]) * np.linalg.norm(arr[j])))
           for j in arr if j != 0}
    want = [j for j, _ in sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))][:3]
    assert order == want


def test_knn_lsh_recall(spark):
    rng = np.random.RandomState(0)
    base = rng.standard_normal((100, 16)).astype(float)
    rows = [(i, base[i].tolist()) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {r.neighbor_id for r in knn_bruteforce(emb, [0], k=10).collect()}
    approx = {r.neighbor_id for r in
              knn_lsh(emb, [0], k=10, dim=16, n_planes=4, n_tables=8).collect()}
    # LSH is approximate: require meaningful recall, not equality
    assert len(exact & approx) >= 4


def test_text_analysis(spark, docs):
    tc = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
          for r in token_counts(docs).collect()}
    assert tc[0][0] == len(DOCS[0][1].split())
    q = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert 0.0 <= q[2].quality_score <= 1.0
    assert q[0].stopword_ratio > q[4].stopword_ratio  # en text hits en stopwords
    langs = {r.doc_id: r.predicted_lang for r in language_id(docs).collect()}
    assert langs[0] == "en" and langs[4] == "de"
    wf = {r.doc_id: r.winnow for r in winnow_fingerprints(docs).collect()}
    assert wf[0] == wf[3] and wf[0] != wf[2]
    assert set(wf[0]) & set(wf[1])  # near-dups share fingerprints


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, 12, seed=1)
    feats = extract_features(assets, fake=True)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r.feature) == 16 for r in rows)
    again = {r.asset_id: r.feature for r in extract_features(assets, fake=True).collect()}
    first = {r.asset_id: r.feature for r in rows}
    assert first == again  # deterministic stub
    frames = sample_frames(assets, every_n=2, fake=True).collect()
    assert all(f.frame_no % 2 == 0 for f in frames)
    from legal_knowledge_graph_spark.operators.multimodal import have_pil
    if not have_pil():
        # no PIL in this container -> the real path must refuse loudly
        with pytest.raises(NotImplementedError):
            extract_features(assets, fake=False)


def test_minhash_equals_exact_at_test_scale(spark, docs):
    """MinHash candidates + exact verify == the exact inverted-index path
    on the fixture (full recall + identical values -> shared SQL oracle)."""
    mh = sorted(map(tuple, minhash_lsh_pairs(docs, threshold=0.5).collect()))
    ng = sorted(map(tuple, ngram_jaccard_pairs(docs, threshold=0.5).collect()))
    assert mh == ng and mh


def test_emb_near_dup_lsh_blocked_plan_and_equality(spark):
    """VERDICT r1 #1: the near-dup plan must be LSH-bucket blocked — no
    BroadcastNestedLoopJoin / CartesianProduct — and its output must equal
    the all-pairs exact path on a planted fixture."""
    import io
    from contextlib import redirect_stdout

    from legal_knowledge_graph_spark.operators.dedup import (
        embedding_near_dup_exact,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal((120, 16))
    base[11] = base[10] + 0.01 * rng.standard_normal(16)   # planted near-dup
    base[57] = base[56] + 0.02 * rng.standard_normal(16)
    emb = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(120)],
        "vec_id long, embedding array<double>")

    lsh_df = embedding_near_dup_pairs(emb, threshold=0.95)
    buf = io.StringIO()
    with redirect_stdout(buf):
        lsh_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    got = sorted(map(tuple, lsh_df.collect()))
    want = sorted(map(tuple, embedding_near_dup_exact(emb, threshold=0.95).collect()))
    assert got == want
    assert {(a, b) for a, b, _ in got} >= {(10, 11), (56, 57)}


def test_simhash_identical_doc_skew_collapses(spark):
    """VERDICT r1 #3 (skew): many near-identical docs share ONE simhash —
    candidate generation must run over distinct signatures (the band join
    sees 1 row, not n), while doc-level output still contains every genuine
    hamming-0 pair."""
    n_dup = 80
    rows = [(i, "hello world again") for i in range(n_dup)]
    rows += [(1000, "completely different content about query engines"),
             (1001, "completely different content about query planners")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()}
    dup_pairs = {(a, b) for (a, b) in out if a < n_dup and b < n_dup}
    assert len(dup_pairs) == n_dup * (n_dup - 1) // 2
    assert all(out[p] == 0 for p in dup_pairs)
    # the two "different" docs pair with each other iff hamming <= 3,
    # never with the dup group
    assert not any((a < n_dup) != (b < n_dup) for a, b in out)


def test_simhash_hot_band_subsplit_is_exact(spark, docs):
    """band_cap=0 forces EVERY bucket through the 12-bit sub-band
    refinement; the output must be identical to the direct band join
    (pigeonhole exactness of the sub-split)."""
    normal = sorted(map(tuple, simhash_near_dup_pairs(
        docs, max_hamming=10).collect()))
    forced = sorted(map(tuple, simhash_near_dup_pairs(
        docs, max_hamming=10, band_cap=0).collect()))
    assert normal == forced and normal


def test_knn_ivf_recall_on_clustered_data(spark):
    """IVF probes the right cells on clustered embeddings: top-k recall vs
    brute force is high when neighbors live in the query's cell."""
    from legal_knowledge_graph_spark.operators.similarity import knn_ivf

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((8, 16)) * 5
    rows = []
    for i in range(200):
        c = i % 8
        rows.append((i, (centers[c] + 0.3 * rng.standard_normal(16)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {}
    for r in knn_bruteforce(emb, [0, 1, 2], k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in knn_ivf(emb, [0, 1, 2], k=10, n_centroids=8, n_probe=2).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    for q in exact:
        assert len(exact[q] & approx[q]) >= 8, (q, exact[q], approx[q])


def test_minhash_identical_doc_skew_collapses(spark):
    """VERDICT r2 #1 (skew): N byte-identical docs share every band value,
    so banding raw doc_ids would make the verify stage pay ~N^2 candidate
    shingle-joins. The rep-based path must band DISTINCT contents only —
    candidate rows stay O(reps^2) — while the doc-level output still
    contains every genuine pair of the clone group at jaccard 1.0."""
    from legal_knowledge_graph_spark.operators.dedup import (
        _minhash_candidates, _shingles)
    from legal_knowledge_graph_spark.operators.text_analysis import fingerprints

    # n_dup must stay under SHINGLE_DF_CAP=500: a clone group larger than
    # the df cap makes ALL its shingles "hot", so the capped-jaccard formula
    # (and the SQL oracle) legitimately scores the group 0 — such groups are
    # exact-dedup's job. 400 keeps every clone shingle rare.
    n_dup = 400
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base) for i in range(n_dup)]
    rows += [(10_000, base + " tonight"),  # near-dup of the clone group
             (10_001, "completely different text about distributed engines")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # candidate stage runs over reps: 3 distinct contents -> <= C(3,2) rows
    reps = exact_duplicates(docs, min_count=1)
    rep_docs = docs.join(
        reps.select(F.col("rep_doc_id").alias("doc_id")), "doc_id", "left_semi")
    n_cand = _minhash_candidates(_shingles(rep_docs, "text"), 12).count()
    assert n_cand <= 3  # C(3,2); banding never saw the 1000 clones

    out = {(r.doc_a, r.doc_b): r.jaccard
           for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    clone_pairs = {(a, b) for (a, b) in out if a < n_dup and b < n_dup}
    assert len(clone_pairs) == n_dup * (n_dup - 1) // 2
    assert all(out[p] == 1.0 for p in clone_pairs)
    # the near-dup expands across the whole clone group, at ONE jaccard
    near = {(a, b): j for (a, b), j in out.items() if b == 10_000}
    assert len(near) == n_dup and len(set(near.values())) == 1
    assert 0.5 <= next(iter(near.values())) < 1.0
    assert not any(b == 10_001 or a == 10_001 for a, b in out)


def _reconstruct_pairs(group_rows):
    """Rebuild the all-pairs set from a group-mode result: cross pairs =
    rep_pair x member expansion, within pairs = member pairs of groups
    whose member score is non-null."""
    members, wscore, rep_pairs = {}, {}, []
    for r in group_rows:
        if r.record_type == "member":
            members.setdefault(r.id_a, []).append(r.id_b)
            if r.score is not None:
                wscore[r.id_a] = r.score
        else:
            rep_pairs.append((r.id_a, r.id_b, r.score))
    pairs = {}
    for ra, rb, s in rep_pairs:
        for x in members[ra]:
            for y in members[rb]:
                pairs[(min(x, y), max(x, y))] = s
    for rep, sc in wscore.items():
        ms = sorted(members[rep])
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs[(ms[i], ms[j])] = sc
    return pairs


def test_dedup_group_mode_linear_and_reconstructs(spark):
    """VERDICT r3 #4: as_groups=True emits O(reps + docs) rows on a
    clone-heavy corpus (not O(clone^2) pairs) and the full pair set —
    values included — reconstructs exactly from the group form."""
    from legal_knowledge_graph_spark.operators.dedup import (
        minhash_lsh_pairs, simhash_near_dup_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"
    rows = ([(i, base) for i in range(40)]
            + [(100 + i, near) for i in range(25)]
            + [(200, "totally different words entirely here now"),
               (201, "unrelated content of another flavor altogether")])
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # 780 within-base + 300 within-near + 1000 cross
    assert len(pairs) == 2080
    grp = minhash_lsh_pairs(docs, threshold=0.5, as_groups=True).collect()
    assert len(grp) <= len(rows) + 5  # linear: members + rep pairs
    assert _reconstruct_pairs(grp) == pairs

    spairs = {(r.doc_a, r.doc_b): float(r.hamming)
              for r in simhash_near_dup_pairs(docs, max_hamming=12).collect()}
    sgrp = simhash_near_dup_pairs(docs, max_hamming=12,
                                  as_groups=True).collect()
    assert len(sgrp) <= len(rows) + 5
    assert _reconstruct_pairs(sgrp) == spairs
    assert len(spairs) >= 780 + 300  # clone groups all pair at hamming 0


def test_deduplicate_corpus_keep_one(spark):
    """Terminal keep-one dedup: the base+near clone cluster (40 + 25 docs,
    jaccard 8/9) collapses to ONE keeper (min doc_id), uniques keep
    themselves, and the kept corpus is exactly the cluster reps."""
    from legal_knowledge_graph_spark.operators.dedup import (
        deduplicate_corpus,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"
    rows = ([(i, base) for i in range(40)]
            + [(100 + i, near) for i in range(25)]
            + [(200, "totally different words entirely here now"),
               (201, "unrelated content of another flavor altogether")])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           deduplicate_corpus(docs, threshold=0.5).collect()}
    assert len(out) == len(rows)
    keepers = {d for d, r in out.items() if r.keep}
    assert keepers == {0, 200, 201}
    # every member of the merged cluster points at doc 0
    assert all(out[i].group_rep == 0 for i in list(range(40))
               + [100 + i for i in range(25)])
    kept_corpus = docs.join(
        deduplicate_corpus(docs, threshold=0.5).where("keep"),
        "doc_id", "left_semi")
    assert sorted(r.doc_id for r in kept_corpus.collect()) == [0, 200, 201]


def test_deduplicate_embeddings_keep_one(spark):
    """SemDeDup-style semantic keep-one: a cluster of near-identical
    vectors collapses to its min vec_id; orthogonal vectors keep
    themselves."""
    from legal_knowledge_graph_spark.operators.dedup import (
        deduplicate_embeddings,
    )

    dim = 16
    base = np.zeros(dim); base[0] = 1.0
    rows = []
    for i in range(6):  # near-identical cluster, ids 0..5
        v = base.copy(); v[1] = 0.01 * i
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    for j in range(3):  # mutually orthogonal singletons, ids 100..102
        v = np.zeros(dim); v[4 + j] = 1.0
        rows.append((100 + j, v.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           deduplicate_embeddings(emb, threshold=0.95, dim=dim).collect()}
    assert {v for v, r in out.items() if r.keep} == {0, 100, 101, 102}
    assert all(out[i].group_rep == 0 for i in range(6))


def test_real_audio_decode_wav(spark):
    """VERDICT r2 #5: real WAV decode via stdlib wave — width carries the
    sample rate, height the channel count, n_frames the PCM frame count,
    feature the peak-normalized 16-segment RMS envelope."""
    import io
    import wave

    from legal_knowledge_graph_spark.operators.multimodal import (
        ASSET_SCHEMA, FEATURE_DIM,
    )

    rate, nfr = 8000, 1600  # 0.2 s
    t = np.arange(nfr) / rate
    # loud first half, quiet second half -> envelope must step down
    amp = np.where(t < 0.1, 12000.0, 1200.0)
    pcm = (amp * np.sin(2 * np.pi * 440.0 * t)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    assets = spark.createDataFrame(
        [("wav_0", "audio", bytearray(buf.getvalue()), {"source": "test"})],
        ASSET_SCHEMA)

    out = extract_features(assets, fake=False, media_types={"audio"}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height, r.n_frames) == (rate, 1, nfr)
    assert len(r.feature) == FEATURE_DIM
    assert max(r.feature) == pytest.approx(1.0)
    # first 8 segments (loud half) dominate the last 8 (quiet half)
    assert min(r.feature[:8]) > max(r.feature[8:]) * 2

    # the capability gate still refuses image work without PIL
    from legal_knowledge_graph_spark.operators.multimodal import have_pil
    if not have_pil():
        with pytest.raises(NotImplementedError):
            extract_features(assets, fake=False, media_types={"image"})


def _make_avi(frames_bgr: list[np.ndarray], audio_first: bool = False) -> bytes:
    """Minimal uncompressed 24-bpp RIFF/AVI writer for tests — the byte
    layout mirrors what any standard tool emits for BI_RGB DIB streams
    (bottom-up rows, 4-byte row padding). audio_first=True prepends an
    'auds' stream (stream 0) with a WAVEFORMATEX strf and interleaves
    '00wb' audio chunks, so the video stream is stream 1 ('01db' frames) —
    the ADVICE r3 stream-pairing fixture."""
    import struct

    h, w, _ = frames_bgr[0].shape
    stride = (w * 3 + 3) & ~3

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\0" if len(body) & 1 else b"")

    def lst(listtype, body):
        return chunk(b"LIST", listtype + body)

    avih = struct.pack("<14I", 40_000, 0, 0, 0, len(frames_bgr), 0, 1,
                       0, w, h, 0, 0, 0, 0)
    strh_v = (b"vids" + b"\0" * 4 + struct.pack("<IHHIIIIIIII", *([0] * 11)))
    strf_v = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         stride * h, 0, 0, 0, 0)
    strl_v = lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v))
    strls = strl_v
    vid_ch = b"00"
    if audio_first:
        strh_a = (b"auds" + b"\0" * 4
                  + struct.pack("<IHHIIIIIIII", *([0] * 11)))
        # 16-byte WAVEFORMATEX (PCM, 1ch, 8kHz) — would be garbage if
        # unpacked as a BITMAPINFOHEADER
        strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        strls = lst(b"strl", chunk(b"strh", strh_a)
                    + chunk(b"strf", strf_a)) + strl_v
        vid_ch = b"01"
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    movi_frames = b""
    for fr in frames_bgr:
        if audio_first:  # interleave audio chunks that must be ignored
            movi_frames += chunk(b"00wb", b"\x11\x22" * 64)
        dib = b"".join(
            fr[y].tobytes() + b"\0" * (stride - w * 3)
            for y in range(h - 1, -1, -1))  # bottom-up
        movi_frames += chunk(vid_ch + b"db", dib)
    body = b"AVI " + hdrl + lst(b"movi", movi_frames)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_real_video_decode_uncompressed_avi(spark):
    """Real video path: stdlib RIFF walk over an uncompressed 24-bpp AVI
    (the video analog of the WAV path — same container family)."""
    from legal_knowledge_graph_spark.operators.multimodal import (
        ASSET_SCHEMA, FEATURE_DIM, sample_frames,
    )

    w, h = 6, 4
    # 5 solid frames with known luminance: gray value == luma exactly
    levels = [0, 64, 128, 192, 255]
    frames = [np.full((h, w, 3), v, dtype=np.uint8) for v in levels]
    avi = _make_avi(frames)
    assets = spark.createDataFrame(
        [("avi_0", "video", bytearray(avi), {"source": "test"}),
         ("bad_0", "audio", bytearray(b"not media"), {"source": "test"})],
        ASSET_SCHEMA)
    vid = assets.where("media_type = 'video'")

    out = extract_features(vid, fake=False, media_types={"video"}).collect()
    assert len(out) == 1 and (out[0].width, out[0].height,
                              out[0].n_frames) == (w, h, 5)
    feat = out[0].feature
    assert len(feat) == FEATURE_DIM
    # envelope = per-frame means (0,64,128,192,255)/255; np.array_split of
    # 5 frames into 16 segments puts one frame in each of the first 5
    # segments and leaves the rest empty (-> 0.0)
    assert feat[:5] == pytest.approx([v / 255.0 for v in levels], abs=1e-3)
    assert all(f == 0.0 for f in feat[5:])

    sampled = sample_frames(vid, every_n=2, fake=False).collect()
    assert sorted(r.frame_no for r in sampled) == [0, 2, 4]
    for r in sampled:
        # solid frame -> histogram mass concentrated in one bin
        assert max(r.feature) == pytest.approx(1.0)

    # codec'd / non-AVI video payloads still raise at decode time
    bad = spark.createDataFrame(
        [("bad_1", "video", bytearray(b"\x00" * 32), {})], ASSET_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|RIFF"):
        extract_features(bad, fake=False, media_types={"video"}).collect()


def test_avi_audio_first_stream_pairing(spark):
    """ADVICE r3: an AVI whose stream 0 is audio must pair each strh with
    ITS strf (never unpack WAVEFORMATEX as a bitmap header) and only
    accept frame chunks of the video stream's number — interleaved '00wb'
    audio chunks are ignored, '01db' frames decode identically to the
    single-stream file."""
    from legal_knowledge_graph_spark.operators.multimodal import (
        ASSET_SCHEMA,
    )

    w, h = 6, 4
    levels = [0, 64, 128, 192, 255]
    frames = [np.full((h, w, 3), v, dtype=np.uint8) for v in levels]
    assets = spark.createDataFrame(
        [("av_mixed", "video", bytearray(_make_avi(frames, audio_first=True)),
          {"source": "test"}),
         ("av_plain", "video", bytearray(_make_avi(frames)),
          {"source": "test"})],
        ASSET_SCHEMA)
    out = {r.asset_id: r for r in
           extract_features(assets, fake=False,
                            media_types={"video"}).collect()}
    mixed, plain = out["av_mixed"], out["av_plain"]
    assert (mixed.width, mixed.height, mixed.n_frames) == (w, h, 5)
    assert mixed.feature == plain.feature

    # the package's own writer (behind the multimodal_real_decode driver
    # query) emits the same byte layout as this test's independent writer
    from legal_knowledge_graph_spark.operators.multimodal import (
        make_avi_bytes,
    )

    assert make_avi_bytes(frames) == _make_avi(frames)
    assert make_avi_bytes(frames, audio_first=True) == \
        _make_avi(frames, audio_first=True)


def test_emb_near_dup_dim_param_skips_probe_job(spark):
    """VERDICT r3 #7: with `dim` passed, building the near-dup plan runs
    ZERO jobs (no .first() probe of the embedding width)."""
    from legal_knowledge_graph_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("dimprobe", "plan construction must be job-free")
    try:
        df = embedding_near_dup_pairs(emb, threshold=0.5, dim=64)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("dimprobe")) == []
    # the probed path (dim=None) produces the identical result
    probed = embedding_near_dup_pairs(emb, threshold=0.5)
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, probed.collect()))


def test_pii_scan_counts_and_redaction(spark):
    from legal_knowledge_graph_spark.operators.pii import pii_scan

    rows = [
        (0, "reach me at alice.smith+spam@corp-mail.co.uk or bob@x.io"),
        (1, "server 192.168.001.7 and 10.0.0.1 up; version 1.2 is not an ip"),
        (2, "call 555-123-4567 or 555 987 6543; 12-34-56 is not a phone"),
        (3, "clean text with no pii at all"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pii_scan(docs).collect()}
    assert (out[0].n_emails, out[0].n_ipv4, out[0].n_phones) == (2, 0, 0)
    assert out[0].redacted == "reach me at <EMAIL> or <EMAIL>"
    assert (out[1].n_emails, out[1].n_ipv4, out[1].n_phones) == (0, 2, 0)
    assert "<IP> and <IP>" in out[1].redacted and "1.2" in out[1].redacted
    assert (out[2].n_emails, out[2].n_ipv4, out[2].n_phones) == (0, 0, 2)
    assert out[2].redacted.count("<PHONE>") == 2 and "12-34-56" in out[2].redacted
    assert (out[3].n_emails, out[3].n_ipv4, out[3].n_phones) == (0, 0, 0)
    assert out[3].redacted == rows[3][1]
    assert out[4].redacted is None


def test_boilerplate_removal(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        boilerplate_lines, remove_boilerplate,
    )

    footer = "(c) ExampleCorp — all rights reserved"
    rows = [
        (0, f"alpha unique zero\n{footer}\nbeta zero"),
        (1, f"{footer}\ngamma unique one\n\nshort"),   # blank + <4 lines kept
        (2, f"delta unique two\n{footer}"),
        (3, "no boilerplate here at all"),
        (4, footer),                                   # only boilerplate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    boiler = {r.line for r in boilerplate_lines(docs, min_docs=2).collect()}
    assert boiler == {footer}

    out = {r.doc_id: r for r in remove_boilerplate(docs, min_docs=2).collect()}
    assert out[0].cleaned == "alpha unique zero\nbeta zero"
    assert out[1].cleaned == "gamma unique one\n\nshort"  # order + blanks kept
    assert out[2].cleaned == "delta unique two"
    assert out[3].cleaned == rows[3][1]
    assert (out[4].cleaned, out[4].n_kept) == ("", 0)
    assert out[0].n_kept == 2

    # frac threshold: the footer is in 4 of 5 docs — a 90% bar
    # (ceil(0.9*5)=5 > 4) clears it, a 50% bar (ceil=3 <= 4) keeps it
    assert {r.line for r in boilerplate_lines(
        docs, min_docs=2, min_doc_frac=0.9).collect()} == set()
    assert {r.line for r in boilerplate_lines(
        docs, min_docs=2, min_doc_frac=0.5).collect()} == {footer}


def test_shingle_zip_shift_equals_slice_spec(spark):
    """_shingles' zip-shift construction (element_at pulls, 10x faster
    than per-index slice inside transform) must emit exactly the distinct
    K-word shingles of the per-index-slice specification."""
    from legal_knowledge_graph_spark.operators.dedup import (
        SHINGLE_K, _shingles,
    )

    rows = [(0, "a b c"), (1, "a b"), (2, ""), (3, None),
            (4, "x  y   z w"), (5, "a a a a"), (6, " lead trail  "),
            (7, "one two three four five six")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def spec(text):
        toks = (text or "").lower().split()
        return {" ".join(toks[i:i + SHINGLE_K])
                for i in range(max(0, len(toks) - SHINGLE_K + 1))} \
            if len(toks) >= SHINGLE_K else set()

    got = {}
    for r in _shingles(docs, "text").collect():
        got.setdefault(r.doc_id, set()).add(r.shingle)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == spec(text), doc_id


def test_benchmark_contamination(spark):
    from legal_knowledge_graph_spark.operators.dedup import (
        benchmark_contamination,
    )

    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench_text),                                   # benchmark member
        (1, "alpha beta gamma delta unrelated tail here"), # partial overlap
        (2, "totally different words in this one doc"),    # clean
        (3, "xy"),                                         # too short: 0 shingles
        (4, bench_text + " extra"),                        # heavy overlap
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    benchmark = docs.where("doc_id = 0")
    out = {r.doc_id: r for r in
           benchmark_contamination(docs, benchmark, threshold=0.5).collect()}
    assert out[0].contamination == 1.0 and out[0].contaminated
    # doc1: shingles = 5, overlapping = {alpha beta gamma, beta gamma delta}
    assert (out[1].n_sh, out[1].n_hit) == (5, 2)
    assert out[1].contamination == 0.4 and not out[1].contaminated
    assert out[2].n_hit == 0 and not out[2].contaminated
    assert (out[3].n_sh, out[3].contamination) == (0, 0.0)
    # doc4: 5 shingles, 4 of them inside the benchmark text
    assert out[4].contaminated and out[4].n_hit == 4


def test_stratified_sampling_deterministic(spark):
    import hashlib

    from legal_knowledge_graph_spark.operators.sampling import (
        exact_k_per_stratum, stratified_sample,
    )

    rows = [(i, "en" if i % 3 else "de", f"s{i % 4}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")

    def h32(i, seed):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16)

    got = {r.doc_id for r in stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.1}, seed=9).collect()}
    want = {i for i, lang, _s in rows
            if h32(i, 9) < {"en": 0.5, "de": 0.1}[lang] * (1 << 32)}
    assert got == want and got  # exact python replay

    # repartitioning must not change the sample
    got2 = {r.doc_id for r in stratified_sample(
        docs.repartition(13), "lang", {"en": 0.5, "de": 0.1}, seed=9).collect()}
    assert got2 == got

    topk = exact_k_per_stratum(docs, "source", k=5, seed=9).collect()
    by_src = {}
    for r in topk:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert all(len(v) == 5 for v in by_src.values())
    for src, ids in by_src.items():
        pool = [i for i, _l, s in rows if s == src]
        want_ids = sorted(pool, key=lambda i: (h32(i, 9), i))[:5]
        assert sorted(ids) == sorted(want_ids), src


def test_exact_k_two_phase_caps_stratum_exchange(spark):
    """VERDICT r3 #2: on a skewed-stratum fixture the stratum-keyed
    Exchange (phase 2) is fed <= k x n_salts candidate rows per stratum —
    never the whole stratum — and the two-phase output equals the
    single-window form at any n_salts."""
    import hashlib

    from pyspark.sql import functions as F
    from legal_knowledge_graph_spark.operators.sampling import (
        _salted_topk_candidates, exact_k_per_stratum,
    )

    # one mega-stratum (10k rows) + two small ones
    rows = [(i, "hot" if i < 10_000 else f"s{i % 2}") for i in range(10_400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    k, n_salts = 7, 16

    cand = _salted_topk_candidates(docs, "source", k, 9, "doc_id", n_salts)
    per_stratum = {r["source"]: r["n"] for r in
                   cand.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= k * n_salts for n in per_stratum.values())
    assert per_stratum["hot"] <= k * n_salts  # 112 rows, not 10k

    got = sorted((r.source, r.doc_id)
                 for r in exact_k_per_stratum(
                     docs, "source", k=k, seed=9, n_salts=n_salts).collect())

    def h32(i, seed):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16)

    want = []
    for src in {"hot", "s0", "s1"}:
        pool = [i for i, s in rows if s == src]
        want += [(src, i)
                 for i in sorted(pool, key=lambda i: (h32(i, 9), i))[:k]]
    assert got == sorted(want)
    # n_salts is a pure parallelism knob — output invariant
    got2 = sorted((r.source, r.doc_id)
                  for r in exact_k_per_stratum(
                      docs, "source", k=k, seed=9, n_salts=3).collect())
    assert got2 == got


def test_pretraining_filter_chain(spark):
    """Composite C4-style filter: reasons compose in fixed order, kept is
    their conjunction, and the whole chain is ONE projection — zero
    Exchange in the executed plan (no joins between the sub-scores)."""
    from legal_knowledge_graph_spark.operators.text_analysis import (
        pretraining_filter,
    )

    good = ("the quick brown fox jumps over a lazy dog and it runs far "
            "away to green hills for it is chased by an old farmer while "
            "birds watch from tall trees near that winding river in early "
            "morning light as the village slowly wakes behind them")
    rows = [
        (0, good, "src_ok"),                       # passes everything
        (1, good, "src_bad"),                      # blocked source only
        (2, "der hund und die katze", "src_ok"),   # german + short + quality
        (3, ("spam ham " * 40).strip(), "src_ok"),  # repetition (+quality)
        (4, "xy", "src_ok"),                       # short + quality + lang
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in pretraining_filter(
        docs, allowed_langs=("en",), min_quality=0.5,
        max_dup_3gram_frac=0.5, min_chars=30,
        blocked_sources=("src_bad",)).collect()}
    assert out[0].kept and out[0].reasons == ""
    assert out[1].reasons == "blocked_source" and not out[1].kept
    assert out[2].reasons.startswith("lang") and "too_short" in out[2].reasons
    assert "repetition" in out[3].reasons and out[3].dup_3gram_frac > 0.9
    assert out[4].reasons.split(",")[0] == "lang" and "too_short" in out[4].reasons
    # every reason list respects the fixed check order
    order = ["lang", "quality", "repetition", "too_short", "too_long",
             "blocked_source"]
    for r in out.values():
        names = [x for x in r.reasons.split(",") if x]
        assert names == sorted(names, key=order.index)
        assert r.kept == (not names)

    plan = pretraining_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one scan, zero shuffle, no joins


def test_repetition_scores(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        repetition_scores,
    )

    rows = [
        (0, "spam spam spam spam spam"),             # total repetition
        (1, "all words here are fully distinct ok"), # none
        (2, "a b c a b c a b c"),                    # repeated 3-gram cycle
        (3, "xy zz"),                                # too short for 3-grams
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_scores(docs).collect()}
    assert (out[0].n_words, out[0].n_distinct_words) == (5, 1)
    assert out[0].dup_word_frac == 0.8
    # 3 identical 3-grams ("spam spam spam") -> 1 distinct of 3
    assert (out[0].n_3grams, out[0].n_distinct_3grams) == (3, 1)
    assert out[1].dup_word_frac == 0.0 and out[1].dup_3gram_frac == 0.0
    # "a b c" x3: 7 grams, distinct = {abc, bca, cab} = 3
    assert (out[2].n_3grams, out[2].n_distinct_3grams) == (7, 3)
    assert (out[3].n_3grams, out[3].dup_3gram_frac) == (0, 0.0)
    assert out[4].n_words == 1  # null -> '' -> ['']


def test_ivf_fit_input_is_deterministic_hash_sample(spark):
    """VERDICT r4 #1: the KMeans fit subset is the closed-form md5 hash
    filter (hash32(vec_id, seed) < fraction * 2^32) — identical at any
    parallelism / layout, and strictly a subset of the corpus."""
    import hashlib

    from legal_knowledge_graph_spark.operators.similarity import (
        _ivf_fit_input,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id")
    ids = [r.vec_id for r in emb.collect()]
    frac, seed = 0.5, 42
    expected = {
        i for i in ids
        if int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16)
        < int(frac * (1 << 32))
    }
    got = {r.vec_id for r in _ivf_fit_input(emb, seed, frac, 8).collect()}
    assert got == expected
    assert 0 < len(expected) < len(ids)
    # layout-independent: same subset from a different input partitioning
    got7 = {r.vec_id
            for r in _ivf_fit_input(emb.repartition(7), seed, frac, 8).collect()}
    assert got7 == expected
    # fraction=None / >=1.0 means the full corpus (pinning only)
    assert {r.vec_id for r in _ivf_fit_input(emb, seed, None, 8).collect()} \
        == set(ids)


def test_knn_ivf_sampled_fit_still_answers(spark):
    """knn_ivf with the default sampled fit (and with max_fit_rows) returns
    k ranked neighbors per query with valid cosine ordering."""
    from legal_knowledge_graph_spark.operators.similarity import knn_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for kwargs in ({}, {"max_fit_rows": 40}):
        out = {}
        for r in knn_ivf(emb, [0, 1], k=5, **kwargs).collect():
            out.setdefault(r.query_id, []).append((r.rank, r.cosine))
        for q, rows in out.items():
            rows.sort()
            assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
            assert all(rows[i][1] >= rows[i + 1][1] for i in range(4))
        assert set(out) == {0, 1}


def test_exact_k_per_stratum_with_ids_repeating_across_strata(spark):
    """ADVICE r4: the candidate re-attach joins on (stratum, id), so an id
    that appears in several strata cannot drag its twins in — the output
    is exactly k rows per stratum."""
    from legal_knowledge_graph_spark.operators.sampling import (
        exact_k_per_stratum,
    )

    docs = spark.createDataFrame(
        [(i, s) for i in range(20) for s in ("a", "b")],
        "doc_id long, source string")
    out = exact_k_per_stratum(docs, "source", k=5, id_col="doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert {s: len(v) for s, v in per.items()} == {"a": 5, "b": 5}


def test_corpus_vocab_closed_form(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        corpus_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb bb cc"), (2, "bb cc cc dd")], "doc_id long, text string")
    rows = corpus_vocab(docs, top_v=3, min_len=1).orderBy("rank").collect()
    # counts: aa 1, bb 3, cc 3, dd 1 (total 8); order bb, cc, aa
    assert [(r.rank, r.word, r.n) for r in rows] == [
        (1, "bb", 3), (2, "cc", 3), (3, "aa", 1)]
    assert [r.coverage for r in rows] == [
        round(3 / 8, 6), round(6 / 8, 6), round(7 / 8, 6)]


def test_tfidf_keywords_closed_form(spark):
    import math

    from legal_knowledge_graph_spark.operators.text_analysis import (
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc"), (3, "cc cc cc")],
        "doc_id long, text string")
    rows = tfidf_keywords(docs, k=2, min_len=1).collect()
    got = {(r.doc_id, r.word): (r.tfidf, r.rank) for r in rows}
    # df: aa 1, bb 2, cc 2; N=3
    idf = {"aa": math.log(3 / 1), "bb": math.log(3 / 2),
           "cc": math.log(3 / 2)}
    want = {
        (1, "aa"): (round(2 * idf["aa"], 6), 1),
        (1, "bb"): (round(1 * idf["bb"], 6), 2),
        (2, "bb"): (round(1 * idf["bb"], 6), 2),  # tie: bb after cc? no —
        (2, "cc"): (round(1 * idf["cc"], 6), 1),
        (3, "cc"): (round(3 * idf["cc"], 6), 1),
    }
    # doc 2: bb and cc tie on score, word-asc tiebreak puts bb first
    want[(2, "bb")] = (round(1 * idf["bb"], 6), 1)
    want[(2, "cc")] = (round(1 * idf["cc"], 6), 2)
    assert got == want


def test_mixture_weights_closed_form(spark):
    from legal_knowledge_graph_spark.operators.sampling import (
        mixture_weights,
    )

    docs = spark.createDataFrame(
        [(i, "a" if i < 2 else "b") for i in range(8)],
        "doc_id long, lang string")
    rows = {r.stratum: r for r in
            mixture_weights(docs, "lang", {"a": 0.5, "b": 0.5}).collect()}
    # a: 2/8 observed vs 0.5 target -> weight 2.0 (the scarce stratum
    # anchors accept=1.0); b: 6/8 vs 0.5 -> weight 2/3, accept 1/3
    assert rows["a"].actual_frac == 0.25 and rows["a"].weight == 2.0
    assert rows["a"].accept_frac == 1.0
    assert rows["b"].weight == round(0.5 / 0.75, 6)
    assert rows["b"].accept_frac == round((0.5 / 0.75) / 2.0, 6)


def test_resample_to_mixture_replays_hash_and_hits_target(spark):
    import hashlib

    from legal_knowledge_graph_spark.operators.sampling import (
        resample_to_mixture,
    )

    rows = [(i, "a" if i % 4 else "b") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    target = {"a": 0.5, "b": 0.5}
    got = resample_to_mixture(docs, "lang", target, seed=7)
    kept = sorted(r.doc_id for r in got.collect())
    # python replay: same counts -> same rates -> same md5-prefix filter
    from collections import Counter
    cnt = Counter(l for _, l in rows)
    t = float(len(rows))
    w = {s: (target[s] / (n / t)) for s, n in cnt.items()}
    wmax = max(w.values())
    rate = {s: v / wmax for s, v in w.items()}
    def h32(i):
        return int(hashlib.md5(f"{i}:7".encode()).hexdigest()[:8], 16)
    want = sorted(i for i, l in rows if h32(i) < rate[l] * (1 << 32))
    assert kept == want
    # deterministic across runs
    again = sorted(r.doc_id for r in
                   resample_to_mixture(docs, "lang", target, seed=7).collect())
    assert again == kept
    # the scarce stratum (b, 25% observed vs 50% target) is kept whole
    kept_langs = Counter(l for i, l in rows if i in set(kept))
    assert kept_langs["b"] == cnt["b"]


def test_duplicate_spans_manifest(spark):
    from legal_knowledge_graph_spark.operators.dedup import duplicate_spans

    # t1..t20 vocab; the shared passage is tokens p1..p8 (eight tokens =
    # four 5-token windows when embedded verbatim)
    shared = "p1 p2 p3 p4 p5 p6 p7 p8"
    rows = [
        # doc 1: shared passage at positions 3..10, then unique tail,
        # then the shared passage AGAIN at 21..28 (second island)
        (1, "u1 u2 " + shared + " " + " ".join(f"x{i}" for i in range(10))
            + " " + shared),
        # doc 2: shared passage at the very start (positions 1..8)
        (2, shared + " y1 y2 y3 y4 y5"),
        # doc 3: a WITHIN-DOC repeated 5-gram that appears nowhere else —
        # must NOT be flagged (dup set counts distinct docs)
        (3, "q1 q2 q3 q4 q5 z1 z2 q1 q2 q3 q4 q5"),
        # doc 4: no overlap at all
        (4, " ".join(f"w{i}" for i in range(12))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(docs, k=5, min_docs=2)
    got = {(r.doc_id, r.span_no): (r.span_start, r.span_end,
                                   r.span_tokens, r.n_windows)
           for r in out.collect()}
    assert got == {
        (1, 1): (3, 10, 8, 4),     # windows at 3,4,5,6 -> span 3..10
        (1, 2): (21, 28, 8, 4),    # gap splits the islands
        (2, 1): (1, 8, 8, 4),
    }
    # determinism across runs
    again = {(r.doc_id, r.span_no): (r.span_start, r.span_end,
                                     r.span_tokens, r.n_windows)
             for r in duplicate_spans(docs, k=5, min_docs=2).collect()}
    assert again == got


def test_duplicate_spans_merges_touching_islands(spark):
    from legal_knowledge_graph_spark.operators.dedup import duplicate_spans

    # two docs share two DISJOINT 5-grams placed back-to-back in doc 1
    # (windows at pos 1 and pos 6: spans 1..5 and 6..10 touch -> one span)
    a, b = "a1 a2 a3 a4 a5", "b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [(1, a + " " + b), (2, a + " z1 z2 z3 z4 z5 " + b)],
        "doc_id long, text string")
    got = {(r.doc_id, r.span_no): (r.span_start, r.span_end, r.n_windows)
           for r in duplicate_spans(docs, k=5, min_docs=2).collect()}
    assert got[(1, 1)] == (1, 10, 2)          # merged into one maximal span
    assert got[(2, 1)] == (1, 5, 1)           # doc 2 keeps them separate
    assert got[(2, 2)] == (11, 15, 1)


def test_bm25_closed_form(spark):
    import math

    from legal_knowledge_graph_spark.operators.text_analysis import (
        bm25_scores,
    )

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana date"),
        (3, "cherry date elderberry fig grape"),
        (4, "apple"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k1, b = 1.2, 0.75
    got = {(r.query_id, r.doc_id): (r.rk, r.bm25)
           for r in bm25_scores(docs, {"qa": ["apple", "banana"]},
                                k1=k1, b=b, topk=10).collect()}

    toks = [t[1].split() for t in rows]
    N, avgdl = 4.0, sum(len(w) for w in toks) / 4.0

    def score(widx):
        s = 0.0
        for t in ["apple", "banana"]:
            tf = float(toks[widx].count(t))
            df = float(sum(1 for w in toks if t in w))
            idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks[widx]) / avgdl))
        return round(s, 4)

    # docs 1,2,4 match; doc 3 has score 0 and must be absent
    want_scores = {i + 1: score(i) for i in range(4) if score(i) > 0}
    assert set(got) == {("qa", d) for d in want_scores}
    for d, sc in want_scores.items():
        assert got[("qa", d)][1] == pytest.approx(sc, abs=1e-9)
    # ranks follow (rounded score desc, doc_id asc)
    order = sorted(want_scores, key=lambda d: (-want_scores[d], d))
    assert [got[("qa", d)][0] for d in order] == [1, 2, 3]
    # zero-df query term contributes nothing and breaks nothing
    z = bm25_scores(docs, {"qz": ["zzz", "apple"]}, topk=2).collect()
    assert all(r.query_id == "qz" for r in z) and len(z) == 2


def test_corpus_length_stats_closed_form(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        corpus_length_stats,
    )

    rows = [(1, "a b c", "en"), (2, "a b c d e", "en"),
            (3, "x", "en"), (4, "y y", "de"), (5, "", "de")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.stratum: r.asDict() for r in
           corpus_length_stats(docs, by="lang").collect()}
    # en lengths sorted: [1, 3, 5] -> p50 = 3, p90 = 1+0.8*... type-7:
    # idx = p*(n-1); p90 -> 1.8 -> 3 + 0.8*(5-3) = 4.6
    en = got["en"]
    assert (en["n_docs"], en["total_tokens"]) == (3, 9)
    assert en["mean_tokens"] == 3.0 and en["p50"] == 3.0
    assert en["p90"] == pytest.approx(4.6, abs=1e-9)
    # empty text counts as 0 tokens
    de = got["de"]
    assert (de["n_docs"], de["total_tokens"]) == (2, 2)
    assert de["p50"] == 1.0
    # approx mode runs and returns the same schema (not oracle-matched)
    ap = corpus_length_stats(docs, by="lang", exact=False)
    assert ap.columns == list(got["en"].keys()) and ap.count() == 2


def test_bpe_learns_sennrich_merges(spark):
    from legal_knowledge_graph_spark.operators.bpe import (
        apply_bpe, learn_bpe,
    )

    # the classic corpus: low x5, lower x2, newest x6, widest x3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [(r["rank"], r.left, r.right, r.pair_count)
           for r in learn_bpe(docs, n_merges=5, min_count=2).collect()]
    # replicate: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7)
    assert got == [(1, "e", "s", 9), (2, "es", "t", 9),
                   (3, "est", "</w>", 9), (4, "l", "o", 7),
                   (5, "lo", "w", 7)]
    toks = {t.word: tuple(t.tokens)
            for t in apply_bpe(docs, [(m[1], m[2]) for m in got]).collect()}
    assert toks["newest"] == ("n", "e", "w", "est</w>")
    assert toks["low"] == ("low", "</w>")
    assert toks["lower"] == ("low", "e", "r", "</w>")
    # greedy left-to-right on overlapping pairs: aaaa + (a,a) -> [aa, aa]
    d2 = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    t2 = apply_bpe(d2, [("a", "a")]).collect()[0]
    assert tuple(t2.tokens) == ("aa", "aa", "</w>")
    # min_count stops before memorizing hapax pairs
    d3 = spark.createDataFrame([(1, "xy")], "doc_id long, text string")
    assert learn_bpe(d3, n_merges=5, min_count=2).count() == 0


def test_ngram_diversity_closed_form(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        ngram_diversity,
    )

    docs = spark.createDataFrame(
        [(0, "en", "a b a b"),       # 1g: 4 tot / 2 dist; 2g: a-b,b-a,a-b
         (1, "en", "a"),             # 1 unigram, no bigrams/trigrams
         (2, "de", ""),              # nothing at all
         (3, "de", "x y z")],        # 3/3; 2/2; 1/1
        "doc_id long, lang string, text string")
    got = {(r.stratum, r.n): (r.total_ngrams, r.distinct_ngrams, r.diversity)
           for r in ngram_diversity(docs).collect()}
    assert got[("en", 1)] == (5, 2, 0.4)          # a x3, b x2
    assert got[("en", 2)] == (3, 2, round(2 / 3, 6))
    assert got[("en", 3)] == (2, 2, 1.0)          # "a b a", "b a b"
    assert got[("de", 1)] == (3, 3, 1.0)
    assert got[("de", 2)] == (2, 2, 1.0)
    assert got[("de", 3)] == (1, 1, 1.0)
    # the empty doc contributes no grams at any n
    assert ("de", 0) not in got and len(got) == 6


def test_knn_ivf_pq_recall_and_rerank_exactness(spark):
    """IVF-PQ on clustered embeddings: ADC-ranked survivors re-ranked
    exactly give high recall vs brute force, and every returned cosine
    equals the exact brute-force cosine for that pair (the re-rank phase
    is exact by construction)."""
    from legal_knowledge_graph_spark.operators.similarity import (
        knn_bruteforce, knn_ivf_pq,
    )

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((8, 16)) * 5
    rows = [(i, (centers[i % 8] + 0.3 * rng.standard_normal(16)).tolist())
            for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {}
    for r in knn_bruteforce(emb, [0, 1, 2], k=10).collect():
        exact[(r.query_id, r.neighbor_id)] = r.cosine
    approx = {}
    for r in knn_ivf_pq(emb, [0, 1, 2], k=10, n_centroids=8, n_probe=2,
                        m_subvectors=4, pq_bits=4, rerank=40).collect():
        approx[(r.query_id, r.neighbor_id)] = r.cosine
    by_q = {}
    for (q, n), c in approx.items():
        by_q.setdefault(q, set()).add(n)
        if (q, n) in exact:
            assert c == exact[(q, n)], (q, n)
    for q in (0, 1, 2):
        hits = {n for (qq, n) in exact if qq == q} & by_q[q]
        assert len(hits) >= 8, (q, hits)


def test_knn_ivf_pq_validates_inputs(spark):
    from legal_knowledge_graph_spark.operators.similarity import knn_ivf_pq

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        knn_ivf_pq(emb, [0], m_subvectors=2)   # 3 % 2 != 0
    with pytest.raises(ValueError):
        knn_ivf_pq(emb, [99])                  # query id absent


def test_weighted_sample_k_matches_reference_and_salts_invariant(spark):
    """E-S weighted draw: matches an independent hashlib/math replay,
    identical at n_salts=1 vs 64, excludes non-positive weights, and is
    exactly-k per stratum."""
    import hashlib
    import math

    from legal_knowledge_graph_spark.operators.sampling import (
        weighted_sample_k,
    )

    rows = [(i, "en" if i % 2 == 0 else "de",
             0 if i == 7 else (i % 9) + 1) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, w int")

    def h32(i, seed=42):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16)

    exp = {}
    for lang in ("en", "de"):
        pri = [(math.log((h32(i) + 1) / 2**32) / w, -i)
               for i, l, w in rows if l == lang and w > 0]
        keep = sorted(pri, reverse=True)[:5]
        exp[lang] = sorted(-i for _, i in keep)

    got = weighted_sample_k(docs, k=5, weight_col="w",
                            strata_col="lang").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert {l: sorted(v) for l, v in by_lang.items()} == exp
    assert 7 not in by_lang["de"] + by_lang["en"]  # zero weight never drawn

    got1 = weighted_sample_k(docs, k=5, weight_col="w", strata_col="lang",
                             n_salts=1).collect()
    assert sorted((r.lang, r.doc_id) for r in got1) == \
        sorted((r.lang, r.doc_id) for r in got)
    # global (stratum-less) mode: exactly k rows, schema preserved
    g = weighted_sample_k(docs, k=8, weight_col="w").collect()
    assert len(g) == 8 and set(g[0].asDict()) == {"doc_id", "lang", "w"}


def test_chunk_documents_closed_form(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))),  # 10 toks: 3 chunks
         (1, "a b c"),                               # fits one chunk
         (2, ""),                                    # no chunks
         (3, " ".join(f"x{i}" for i in range(5)))],  # n == chunk exactly
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=5, overlap_tokens=2)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert {d for d, _ in rows} == {0, 1, 3}
    # doc 0: starts 0,3,6 — ceil((10-5)/3)=2 tails; last chunk truncated
    assert [(rows[(0, k)].start_tok, rows[(0, k)].n_tok)
            for k in range(3)] == [(0, 5), (3, 5), (6, 4)]
    assert rows[(0, 1)].chunk_text == "t3 t4 t5 t6 t7"
    # consecutive chunks overlap by exactly overlap_tokens
    assert rows[(0, 0)].chunk_text.split()[-2:] == \
        rows[(0, 1)].chunk_text.split()[:2]
    # full coverage: union of [start, start+n) spans 0..10
    covered = set()
    for k in range(3):
        r = rows[(0, k)]
        covered |= set(range(r.start_tok, r.start_tok + r.n_tok))
    assert covered == set(range(10))
    assert (rows[(1, 0)].start_tok, rows[(1, 0)].n_tok) == (0, 3)
    assert (3, 1) not in rows and (rows[(3, 0)].n_tok) == 5
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=5, overlap_tokens=5)


def test_inverted_index_closed_form(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        inverted_index,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog"), (3, "THE  cat"),
         (4, ""), (5, None)],
        "doc_id long, text string")
    got = {r.word: (r.df, r.postings)
           for r in inverted_index(docs, max_postings=2, min_df=1).collect()}
    # case-folded, whitespace-split; empty/null docs contribute nothing
    assert got["the"] == (3, "1,2")       # df counts ALL docs, cap keeps 2
    assert got["cat"] == (2, "1,3")
    assert got["dog"] == (1, "2")
    assert got["sat"] == (1, "1")
    # min_df prunes hapax rows; max_df prunes stopword rows
    pruned = {r.word for r in
              inverted_index(docs, max_postings=2, min_df=2).collect()}
    assert pruned == {"the", "cat"}
    capped = {r.word for r in
              inverted_index(docs, max_postings=2, max_df=2).collect()}
    assert "the" not in capped and "cat" in capped


def test_inverted_index_cap_is_global_smallest_k(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        inverted_index,
    )

    # 300 docs all holding "w": the two-phase salted selection must
    # return exactly the 5 smallest doc_ids regardless of salt layout
    docs = spark.createDataFrame(
        [(i, "w") for i in range(300)], "doc_id long, text string") \
        .repartition(16)
    [r] = inverted_index(docs, max_postings=5).collect()
    assert (r.word, r.df, r.postings) == ("w", 300, "0,1,2,3,4")


def test_knn_classify_majority_and_tiebreak(spark):
    from legal_knowledge_graph_spark.operators.similarity import (
        knn_classify,
    )

    # two clean clusters on orthogonal axes, one query per cluster:
    # neighbors of q0 are mostly label 0, of q10 mostly label 1
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.001 * i], 0))
    for i in range(6):
        rows.append((10 + i, [0.001 * i, 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    got = {r.query_id: (r.true_label, r.predicted_label, r.votes)
           for r in knn_classify(emb, [0, 10], k=5).collect()}
    assert got[0] == (0, 0, 5)
    assert got[10] == (1, 1, 5)
    # vote tie (k=2 straddling the clusters' boundary member) breaks to
    # the SMALLEST label deterministically: build an exact 1-1 split
    tie = spark.createDataFrame(
        [(0, [1.0, 1.0], 9),
         (1, [1.0, 0.9], 5), (2, [0.9, 1.0], 3)],
        "vec_id long, embedding array<double>, label int")
    [r] = knn_classify(tie, [0], k=2).collect()
    assert (r.true_label, r.predicted_label, r.votes) == (9, 3, 1)


def test_project_embeddings_matches_numpy_and_preserves_norms(spark):
    from legal_knowledge_graph_spark.operators.similarity import (
        _projection_matrix, project_embeddings,
    )

    rng = np.random.RandomState(7)
    X = rng.standard_normal((40, 16))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>")
    out = project_embeddings(emb, in_dim=16, out_dim=4, seed=3) \
        .orderBy("vec_id").collect()
    R = _projection_matrix(16, 4, 3)
    want = X @ R.T
    got = np.array([[r.y0, r.y1, r.y2, r.y3] for r in out])
    assert np.allclose(got, np.round(want, 6), atol=1e-9)
    # JL sanity: mean squared norm is approximately preserved
    assert abs(np.mean((X ** 2).sum(1)) - np.mean((want ** 2).sum(1))) \
        < 0.35 * np.mean((X ** 2).sum(1))
    # seed changes the matrix; same seed reproduces it exactly
    assert not np.allclose(_projection_matrix(16, 4, 3),
                           _projection_matrix(16, 4, 4))
    assert np.array_equal(_projection_matrix(16, 4, 3), R)


def test_kmv_distinct_small_exact_and_large_close(spark):
    from legal_knowledge_graph_spark.operators.sketches import kmv_distinct

    # small group (< k distinct): exact fallback, est == true count
    rows = [("a", i % 10) for i in range(100)]
    # large group: 5000 distinct values, k=64 sketch
    rows += [("b", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "grp string, val long")
    got = {r.grp: (r.est_distinct, r.n_distinct)
           for r in kmv_distinct(df, "grp", "val", k=64).collect()}
    assert got["a"] == (10.0, 10)
    est_b, true_b = got["b"]
    assert true_b == 5000
    assert abs(est_b - 5000) / 5000 < 0.30  # k=64 -> ~1/sqrt(62) rel err
    # determinism: layout must not change the estimate
    got2 = {r.grp: r.est_distinct
            for r in kmv_distinct(df.repartition(13), "grp", "val",
                                  k=64).collect()}
    assert got2["b"] == est_b
    # duplicates never inflate the sketch
    dup = df.unionByName(df)
    got3 = {r.grp: (r.est_distinct, r.n_distinct)
            for r in kmv_distinct(dup, "grp", "val", k=64).collect()}
    assert got3 == got


def test_kmv_rolling_merge_equals_scratch_recompute(spark):
    from datetime import datetime as dt, timedelta

    from legal_knowledge_graph_spark.operators.sketches import (
        kmv_distinct, kmv_rolling_distinct,
    )

    # 30 hours; hour h sees users from a sliding population so windows
    # genuinely differ; k=16 << distinct per window
    rows = []
    for h in range(30):
        for u in range(h * 40, h * 40 + 120):
            rows.append((dt(2024, 1, 1) + timedelta(hours=h), u))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    rolled = {r.hour: r.est_distinct
              for r in kmv_rolling_distinct(
                  ev, window_hours=6, k=16).collect()}
    assert len(rolled) == 30
    # merge property: the rolled estimate for hour h equals a
    # from-scratch KMV over the union of the trailing 6 observed hours
    for h in (5, 17, 29):
        lo = dt(2024, 1, 1) + timedelta(hours=h - 5)
        hi = dt(2024, 1, 1) + timedelta(hours=h)
        win = ev.where((F.col("ts") >= lo) & (F.col("ts") <= hi)) \
            .withColumn("g", F.lit("w"))
        [r] = kmv_distinct(win, "g", "user_id", k=16, exact=False).collect()
        assert rolled[hi] == r.est_distinct
    # accuracy sanity at k=64 on a 320-distinct window
    rolled64 = {r.hour: r.est_distinct
                for r in kmv_rolling_distinct(
                    ev, window_hours=6, k=64).collect()}
    true_h29 = len({u for (ts, u) in rows
                    if ts >= dt(2024, 1, 1) + timedelta(hours=24)})
    est = rolled64[dt(2024, 1, 1) + timedelta(hours=29)]
    assert abs(est - true_h29) / true_h29 < 0.35


def _lev1(a, b):
    # distance <= 1 check (lengths differ by > 1 -> no)
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    s, t = (a, b) if la < lb else (b, a)
    for i in range(len(t)):
        if t[:i] + t[i + 1:] == s:
            return True
    return False


def test_edit_distance_pairs_complete_vs_bruteforce(spark):
    import random

    from legal_knowledge_graph_spark.operators.dedup import (
        edit_distance_pairs,
    )

    rng = random.Random(11)
    base = ["".join(rng.choice("abcd") for _ in range(rng.randint(2, 6)))
            for _ in range(80)]
    # plant guaranteed neighbors: deletions, substitutions, insertions
    planted = [w[1:] for w in base[:10]] + \
              ["x" + w[1:] for w in base[10:20]] + \
              [w + "z" for w in base[20:30]]
    vocab = sorted(set(base + planted) - {""})
    df = spark.createDataFrame([(w,) for w in vocab], "word string")
    got = {(r.word_a, r.word_b) for r in edit_distance_pairs(df).collect()}
    want = {(a, b) for i, a in enumerate(vocab) for b in vocab[i + 1:]
            if _lev1(a, b)}
    assert got == want and len(want) > 20
    # blocked plan: equi-join on the variant, never a cartesian product
    plan = edit_distance_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_equidepth_bins_closed_form(spark):
    from legal_knowledge_graph_spark.operators.profiling import (
        equidepth_bins,
    )

    # 25 rows into 10 bins: first 5 bins get 3 rows, last 5 get 2
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(25)], "doc_id long, v long")
    out = {r.bin: (r.n, r.lo, r.hi) for r in
           equidepth_bins(df, "v", n_bins=10).collect()}
    assert [out[b][0] for b in range(1, 11)] == [3] * 5 + [2] * 5
    assert out[1] == (3, 0, 20) and out[10] == (2, 230, 240)
    # bins partition the ordered domain: ranges don't overlap
    for b in range(1, 10):
        assert out[b][2] < out[b + 1][1] or out[b][2] <= out[b + 1][1]


def test_numeric_corr_matches_numpy(spark):
    from legal_knowledge_graph_spark.operators.profiling import (
        numeric_corr,
    )

    rng = np.random.RandomState(5)
    x = rng.standard_normal(500)
    y = 2 * x + rng.standard_normal(500) * 0.5
    z = rng.standard_normal(500)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    got = {(r.col_a, r.col_b): r.corr
           for r in numeric_corr(df, ["x", "y", "z"]).collect()}
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert abs(got[("x", "y")] - np.corrcoef(x, y)[0, 1]) < 1e-6
    assert abs(got[("x", "z")] - np.corrcoef(x, z)[0, 1]) < 1e-6


def test_mutual_information_closed_form(spark):
    import math

    from legal_knowledge_graph_spark.operators.profiling import (
        mutual_information,
    )

    # perfectly dependent: MI = H = ln(2), NMI = 1
    dep = spark.createDataFrame(
        [("a", 0)] * 50 + [("b", 1)] * 50, "x string, y int")
    [r] = mutual_information(dep, "x", "y").collect()
    assert abs(r.mi - math.log(2)) < 1e-6 and abs(r.nmi - 1.0) < 1e-6
    assert (r.n_x, r.n_y) == (2, 2)
    # independent uniform: MI = 0
    ind = spark.createDataFrame(
        [(a, b) for a in "ab" for b in (0, 1) for _ in range(25)],
        "x string, y int")
    [r2] = mutual_information(ind, "x", "y").collect()
    assert abs(r2.mi) < 1e-9 and abs(r2.nmi) < 1e-9


def test_textrank_chunks_matches_numpy_reference(spark):
    import math

    from legal_knowledge_graph_spark.operators.text_analysis import (
        textrank_chunks,
    )

    # one 30-word doc -> 3 chunks with engineered overlaps, plus a
    # second doc whose two chunks share nothing (isolated nodes)
    d1 = ("alpha beta gamma delta alpha beta gamma delta alpha beta "
          "gamma delta epsilon zeta eta theta gamma delta iota kappa "
          "mu nu xi omicron pi rho mu nu sigma tau")
    d2 = ("one two three four five six seven eight nine ten "
          "eleven twelve thirteen fourteen fifteen sixteen seventeen "
          "eighteen nineteen twenty")
    docs = spark.createDataFrame([(1, d1), (2, d2)],
                                 "doc_id long, text string")
    out = textrank_chunks(docs, chunk_size=10, n_iter=10, top_k=3)
    got = {(r.doc_id, r.idx): (r.score, r.rk, r.chunk_text)
           for r in out.collect()}

    # numpy reference of the identical recurrence for doc 1
    chunks = [d1.split()[i:i + 10] for i in range(0, 30, 10)]
    n = len(chunks)
    W = [[0.0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i != j:
                c = len(set(chunks[i]) & set(chunks[j]))
                if c:
                    W[i][j] = c / max(
                        math.log(len(chunks[i])) + math.log(len(chunks[j])),
                        1e-9)
    r = [1.0 / n] * n
    for _ in range(10):
        s = [sum(W[j]) for j in range(n)]
        r = [0.15 / n + 0.85 * sum(
            W[j][i] / s[j] * r[j] for j in range(n) if s[j] > 0)
            for i in range(n)]
    for i in range(n):
        assert abs(got[(1, i)][0] - round(r[i], 6)) <= 1e-6
    # doc 2: no overlaps -> every chunk settles at the teleport value
    assert got[(2, 0)][0] == round(0.15 / 2, 6)
    assert got[(2, 1)][0] == round(0.15 / 2, 6)
    # chunk text reassembles in position order
    assert got[(1, 0)][2].startswith("alpha beta gamma delta")


def test_check_rules_and_referential_integrity(spark):
    from legal_knowledge_graph_spark.operators.quality_checks import (
        check_rules, referential_integrity,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "x"), (2, None, "y"), (3, 200.0, None), (4, -5.0, "x")],
        "id long, v double, s string")
    rules = [
        {"name": "v_null", "kind": "null_rate", "col": "v"},
        {"name": "v_range", "kind": "range", "col": "v", "lo": 0, "hi": 100},
        {"name": "s_enum", "kind": "expression", "expr": "s IN ('x', 'y')"},
    ]
    got = {r.rule: (r.n_violations, r.n_rows, r.violation_rate)
           for r in check_rules(df, rules).collect()}
    assert got["v_null"] == (1, 4, 0.25)
    # range violations include the NULL (must hold provably) + 200 + -5
    assert got["v_range"] == (3, 4, 0.75)
    # expression: NULL s is a violation
    assert got["s_enum"] == (1, 4, 0.25)
    # the battery is ONE aggregate: a single scan in the plan
    plan = check_rules(df, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.lower().count("scan existingrdd") <= 1

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "k long")
    [r] = referential_integrity(child, parent, "k", "k").collect()
    assert (r.n_orphans, r.n_child_rows, r.orphan_rate) == (2, 5, 0.4)


def test_table_diff_closed_form(spark):
    from legal_knowledge_graph_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged -> dropped
         (2, "B", 21.0),          # changed: s and v
         (3, "c", 30.0),          # changed: NULL -> value (null-safe)
         (5, "e", 50.0)],         # added; key 4 removed
        "k long, s string, v double")
    got = {r.k: (r.change, r.changed_cols)
           for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: ("changed", "s,v"),
                   3: ("changed", "v"),
                   4: ("removed", ""),
                   5: ("added", "")}
    assert 1 not in got
    # compare_cols restricts which columns participate
    got2 = {r.k: r.change
            for r in table_diff(old, new, ["k"], ["s"]).collect()}
    assert got2 == {2: "changed", 4: "removed", 5: "added"}


def test_exact_quantiles_matches_numpy_via_histogram_path(spark):
    from legal_knowledge_graph_spark.operators.profiling import (
        exact_quantiles,
    )

    rng = np.random.RandomState(3)
    xs = np.round(rng.lognormal(4, 1, 5000), 2)
    df = spark.createDataFrame([(float(v),) for v in xs], "v double")
    ps = [0.1, 0.5, 0.9, 0.99]
    # collect_cap far below n forces the histogram-narrowing recursion
    got = {r.p: r.value for r in exact_quantiles(
        df, "v", ps, n_buckets=64, collect_cap=200).collect()}
    want = np.quantile(xs, ps)  # numpy default = type-7 interpolation
    for p, w in zip(ps, want):
        assert abs(got[p] - round(float(w), 6)) <= 1e-6
    # duplicate-heavy distribution (all-dup buckets short-circuit)
    dup = spark.createDataFrame(
        [(float(v),) for v in [1.0] * 3000 + [2.0] * 1000], "v double")
    got2 = {r.p: r.value for r in exact_quantiles(
        dup, "v", [0.5, 0.9], n_buckets=8, collect_cap=100).collect()}
    assert got2[0.5] == 1.0
    assert got2[0.9] == round(float(np.quantile(
        [1.0] * 3000 + [2.0] * 1000, 0.9)), 6)


def test_exact_quantiles_job_count_batched(spark):
    """r6 (VERDICT r5 #1): ALL order statistics must resolve in a
    constant number of jobs — one checkpoint (stats ride observe()),
    one histogram per level, one batched collect — never a count +
    full collect per k (the r5 shape was ~17 jobs for 4 quantiles)."""
    from legal_knowledge_graph_spark.operators.profiling import (
        exact_quantiles,
    )

    df = spark.range(300_000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 7.0).alias("v"))
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    out = exact_quantiles(df, "v", [0.25, 0.5, 0.75, 0.99],
                          collect_cap=50_000).collect()
    jobs = len(set(tracker.getJobIdsForGroup(None)) - before)
    assert len(out) == 4
    # checkpoint + 1 histogram level + batched collect (+ slack for
    # runner-internal jobs); the per-k shape needed >= 2 jobs per k
    assert jobs <= 6, f"expected batched job count, got {jobs}"


def test_textrank_long_doc_blocking(spark):
    """r6 (VERDICT r5 #2): pair generation must be word-blocked — a
    long document may not materialize n_chunks^2 candidate pairs. The
    fixture's vocabulary is engineered so each word lives in exactly
    one chunk-pair neighborhood: the blocked candidate count stays
    linear in chunks while the old cross join would build ~n^2/2."""
    from legal_knowledge_graph_spark.operators.text_analysis import (
        _split_words, textrank_chunks,
    )

    # 5,000-word doc -> 500 chunks of 10; chunk i shares word f"w{i}"
    # with chunk i+1 only (plus unique filler), so true pairs = 499
    words = []
    for i in range(500):
        words += [f"w{i}"] + [f"u{i}_{j}" for j in range(8)] + [f"w{i+1}"]
    long_doc = " ".join(words)
    docs = spark.createDataFrame(
        [(1, long_doc), (2, "completely separate tiny text here")],
        "doc_id long, text string")

    # white-box candidate bound: replicate the blocked generator's
    # fan-out — sum over (doc, word) of c*(c-1)/2 — and check it is
    # linear (each word in <= 2 chunks), vs ~124,750 for the cross join
    toks = docs.select(
        "doc_id", F.posexplode(_split_words("text")).alias("pos", "w")) \
        .where(F.col("w") != "")
    cw = toks.groupBy(
        "doc_id", F.floor(F.col("pos") / 10).alias("idx"), "w").count() \
        .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    fanout = cw.select(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("s")).collect()[0].s
    assert fanout <= 600, f"blocked fan-out should be linear, got {fanout}"

    out = textrank_chunks(docs, chunk_size=10, n_iter=3, top_k=2)
    rows = out.collect()
    # top_k per doc, every score positive, long doc ranks its chunks
    assert len([r for r in rows if r.doc_id == 1]) == 2
    assert len([r for r in rows if r.doc_id == 2]) == 1
    assert all(r.score > 0 for r in rows)


def test_key_skew_profile_closed_form(spark):
    import math

    from legal_knowledge_graph_spark.operators.profiling import (
        key_skew_profile,
    )

    # key "hot" owns 60 of 100 rows; 40 keys own 1 each
    rows = [("hot",)] * 60 + [(f"k{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    [r] = key_skew_profile(df, ["k"], top_k=3).collect()
    assert (r.n_keys, r.n_rows) == (41, 100)
    assert r.max_share == 0.6
    assert r.topk_share == round(62 / 100, 6)   # hot + 2 singletons
    counts = [60] + [1] * 40
    mean = sum(counts) / 41
    var = sum((c - mean) ** 2 for c in counts) / 40  # sample variance
    assert r.cv == round(math.sqrt(var) / mean, 6)
    h = -sum((c / 100) * math.log(c / 100) for c in counts)
    assert r.evenness == round(h / math.log(41), 6)
    # uniform keys -> evenness 1.0, max_share = 1/n
    uni = spark.createDataFrame([(f"k{i % 10}",) for i in range(100)],
                                "k string")
    [u] = key_skew_profile(uni, ["k"]).collect()
    assert u.evenness == 1.0 and u.max_share == 0.1 and u.cv == 0.0


def test_rake_keyphrases_closed_form(spark):
    from legal_knowledge_graph_spark.operators.text_analysis import (
        rake_keyphrases,
    )

    # "the" and "a" are stopwords; doc 1 has runs:
    #   [deep learning], [deep learning systems], [fast]
    text = "the deep learning a deep learning systems a fast"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.phrase: (r.score, r.rk)
           for r in rake_keyphrases(docs, top_k=5).collect()}
    # freq: deep 2, learning 2, systems 1, fast 1
    # deg:  deep 2+3=5, learning 5, systems 3, fast 1
    s_dl = 5 / 2 + 5 / 2
    s_dls = 5 / 2 + 5 / 2 + 3 / 1
    assert got["deep learning systems"] == (round(s_dls, 6), 1)
    assert got["deep learning"] == (round(s_dl, 6), 2)
    assert got["fast"] == (round(1 / 1, 6), 3)
    # a run longer than max_phrase_len is discarded entirely
    longdoc = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon the zeta")],
        "doc_id long, text string")
    got2 = {r.phrase for r in
            rake_keyphrases(longdoc, top_k=5, max_phrase_len=4).collect()}
    assert got2 == {"zeta"}
