"""Multimodal-column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schema, partitioning, Arrow
UDF signatures, batch shapes; the actual codec work is STUBBED (the
image/audio libraries are not in this container): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
bytes-hash-derived feature vector stands in so downstream plumbing
(resize, feature-extract, frame-sample, dedup-by-feature) is exercised
end-to-end.

Production swap-in: replace `_fake_decode` with PIL/libav inside the same
mapInPandas body; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("data", T.BinaryType(), True),          # opaque payload
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])

FEATURE_DIM = 16


def _fake_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in decode: dimensions and a FEATURE_DIM feature
    vector derived from the payload hash. STUB — see module docstring."""
    h = hashlib.sha256(data or b"").digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    n_frames = 1 + h[2] % 8
    feat = np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint8)[:FEATURE_DIM]
    return width, height, n_frames, (feat.astype(np.float32) / 255.0)


def _real_image_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Optional real path (VERDICT r1 #9): PIL decode + 16-bin grayscale
    histogram feature. Import is deferred so the stub path never needs PIL."""
    import io

    from PIL import Image  # noqa: import-error — optional dependency

    img = Image.open(io.BytesIO(data)).convert("L")
    hist = np.asarray(img.resize((32, 32))).ravel()
    feat, _ = np.histogram(hist, bins=FEATURE_DIM, range=(0, 256))
    feat = feat.astype(np.float32) / max(feat.sum(), 1)
    return img.width, img.height, 1, feat


def _real_audio_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Optional real audio path (VERDICT r2 #5): stdlib `wave` for WAV/PCM
    — zero extra dependencies. Field mapping into the shared
    FEATURE_SCHEMA: width = sample rate (Hz), height = channel count,
    n_frames = PCM frame count (so duration_sec = n_frames / width);
    feature = FEATURE_DIM-segment RMS envelope, peak-normalized."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as w:
        rate, nch = w.getframerate(), w.getnchannels()
        nfr, sw = w.getnframes(), w.getsampwidth()
        raw = w.readframes(nfr)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif sw == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    if x.size:
        feat = np.array(
            [np.sqrt(np.mean(s * s)) if s.size else 0.0
             for s in np.array_split(x, FEATURE_DIM)], dtype=np.float32)
    else:
        feat = np.zeros(FEATURE_DIM, dtype=np.float32)
    peak = float(feat.max())
    if peak > 0:
        feat = feat / peak
    return rate, nch, nfr, feat


def have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def extract_features(assets: DataFrame, fake: bool = True,
                     media_types: set[str] | None = None) -> DataFrame:
    """decode + feature-extract over Arrow batches (mapInPandas).

    fake=True (default here): deterministic bytes-hash stand-in.
    fake=False: real decode into the same FEATURE_SCHEMA — PIL for images
    (when importable on the executors), stdlib `wave` for WAV audio
    (always available), NotImplementedError for video (no libav in this
    container). `media_types` declares what the asset table contains so
    the capability gate only demands the codecs actually needed (e.g.
    {"audio"} works without PIL); None assumes all three.
    """
    if not fake:
        need = media_types or {"image", "audio", "video"}
        if "image" in need and not have_pil():
            raise NotImplementedError(
                "real image decode requires PIL — not available in this "
                "environment; pass fake=True for the deterministic stub, "
                "or media_types={'audio'} for WAV-only corpora")
        if "video" in need:
            raise NotImplementedError("real video decode requires libav")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if fake:
                    w, h, nf, feat = _fake_decode(r.data)
                    nf = nf if r.media_type == "video" else 1
                elif r.media_type == "image":
                    w, h, _, feat = _real_image_decode(r.data)
                    nf = 1
                elif r.media_type == "audio":
                    w, h, nf, feat = _real_audio_decode(r.data)
                else:
                    raise NotImplementedError(
                        f"real {r.media_type} decode requires libav")
                rows.append((r.asset_id, r.media_type, w, h, nf,
                             feat.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 2, fake: bool = True) -> DataFrame:
    """UDTF-shaped frame sampling: one output row per sampled frame of a
    video asset (schema + batch-shape plumbing; decode stubbed)."""
    if not fake:
        raise NotImplementedError("real frame decode not available here")
    out_schema = T.StructType([
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ])

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "video":
                    continue
                _, _, nf, feat = _fake_decode(r.data)
                for f_no in range(0, nf, every_n):
                    # per-frame feature = hash-mix of (payload, frame_no)
                    mix = hashlib.sha256((r.data or b"") + bytes([f_no])).digest()
                    fv = (np.frombuffer(mix[:FEATURE_DIM * 2], dtype=np.uint8)
                          [:FEATURE_DIM].astype(np.float32) / 255.0)
                    rows.append((r.asset_id, f_no, fv.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return assets.mapInPandas(run, schema=out_schema)


def synthetic_assets(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests. Payload is the ASCII
    hexdigest repeated 4x (not raw digest bytes) so the DuckDB correctness
    oracle can recompute the fake-decode features with sha256(VARCHAR)."""
    rows = []
    for i in range(n):
        payload = (hashlib.sha256(f"{seed}:asset:{i}".encode()).hexdigest() * 4
                   ).encode()
        mt = ("image", "audio", "video")[i % 3]
        rows.append((f"asset_{i:05d}", mt, bytearray(payload),
                     {"source": f"synthetic:{seed}"}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
