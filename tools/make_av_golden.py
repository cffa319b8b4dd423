"""Materialize the real-decode A/V golden parquet (VERDICT r3 #5): the
multimodal_real_decode driver query runs the REAL stdlib WAV + RIFF/AVI
decoders over the deterministic synthetic A/V corpus
(multimodal.synthetic_av_rows) through the Spark mapInPandas plumbing;
this tool replays the SAME decode driver-side (no Spark) and commits the
result — the oracle therefore checks that the distributed path reproduces
the driver-side replay bit-for-bit (decoder semantics themselves are
pinned by known-signal unit tests in tests/test_training_ops.py).

Writes golden/{sf0.001,sf0.01,sf0.1}/golden_av.parquet (the corpus is
sf-independent, like synthetic_assets). Pure driver-side Python + pyarrow.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legal_knowledge_graph_spark.operators.multimodal import (  # noqa: E402
    _real_audio_decode, _real_video_decode, synthetic_av_rows,
)

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "golden")
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    out_rows = []
    for asset_id, media_type, payload, _meta in synthetic_av_rows():
        data = bytes(payload)
        if media_type == "audio":
            w, h, nf, feat = _real_audio_decode(data)
        else:
            w, h, nf, feat = _real_video_decode(data)
        for fi, fv in enumerate(feat):
            # float32 -> double is exact; both sides widen the identical
            # bits, so the comparison is bit-for-bit without rounding
            out_rows.append((asset_id, media_type, w, h, nf, fi,
                             float(fv)))
    table = pa.table({
        "asset_id": pa.array([r[0] for r in out_rows], pa.string()),
        "media_type": pa.array([r[1] for r in out_rows], pa.string()),
        "width": pa.array([r[2] for r in out_rows], pa.int32()),
        "height": pa.array([r[3] for r in out_rows], pa.int32()),
        "n_frames": pa.array([r[4] for r in out_rows], pa.int32()),
        "fi": pa.array([r[5] for r in out_rows], pa.int32()),
        "fv": pa.array([r[6] for r in out_rows], pa.float64()),
    })
    for sf in SFS:
        out = os.path.join(ROOT, sf)
        os.makedirs(out, exist_ok=True)
        pq.write_table(table, os.path.join(out, "golden_av.parquet"))
    print(f"{len(out_rows)} rows -> golden/{{{','.join(SFS)}}}/golden_av.parquet")


if __name__ == "__main__":
    main()
