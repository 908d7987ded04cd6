"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side plumbing — schemas, Arrow batch shapes, partition-size
control, UDF signatures — is real and tested; the *codec* step is
stubbed (no image/audio libraries in this container) behind
``DECODERS``: a deterministic fake decoder by default, a
NotImplementedError-raising hook where a real libjpeg/ffmpeg call
would go. Swapping in a real decoder changes one function, not the
pipeline.

Pattern: ``mapInPandas`` over batches of (id, media binary, media_type)
→ typed metadata + fixed-width feature vector. Batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; binary payloads never
hit the driver.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_FEATURES_SCHEMA = (
    "id long, media_type string, n_bytes long, width int, height int, "
    "checksum string, features array<float>"
)

_FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: derives pseudo
    dimensions and a feature vector from the bytes themselves, so the
    plumbing (shapes, types, batching) is fully exercised and testable.
    """
    h = hashlib.sha256(payload).digest()
    width = 1 + int.from_bytes(h[0:2], "big") % 4096
    height = 1 + int.from_bytes(h[2:4], "big") % 4096
    # divisor 2^16: a 16-bit int over a power of two is exactly
    # representable in float32, so the features survive the
    # array<float> schema and the double-typed SQL oracle bit-identically
    feats = [
        (int.from_bytes(h[4 + 2 * i : 6 + 2 * i], "big") / 65536.0)
        for i in range(_FEATURE_DIM)
    ]
    return {
        "width": width,
        "height": height,
        "checksum": h.hex()[:16],
        "features": feats,
    }


def _real_decode(payload: bytes) -> dict:  # pragma: no cover - stub
    raise NotImplementedError(
        "real image/audio decoding requires PIL/ffmpeg, not present in "
        "this container; register a decoder in DECODERS to enable"
    )


DECODERS = {"fake": _fake_decode, "real": _real_decode}


def extract_media_features(
    media: DataFrame,
    id_col: str = "id",
    bytes_col: str = "media",
    type_col: str = "media_type",
    decoder: str = "fake",
) -> DataFrame:
    """binary media → typed metadata + features, via Arrow batches."""
    decode = DECODERS[decoder]

    def run(batches):
        for pdf in batches:
            recs = []
            for i, b, t in zip(pdf[id_col], pdf[bytes_col], pdf[type_col]):
                payload = bytes(b) if b is not None else b""
                d = decode(payload)
                recs.append(
                    {
                        "id": int(i),
                        "media_type": str(t),
                        "n_bytes": len(payload),
                        "width": d["width"],
                        "height": d["height"],
                        "checksum": d["checksum"],
                        "features": [float(x) for x in d["features"]],
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "id",
    bytes_col: str = "media",
) -> DataFrame:
    """"Frame sampling" plumbing demo: emit ≤max_frames fixed-offset
    slices per blob as (id, frame_no, offset, frame binary). A real
    video pipeline replaces the slicer with a keyframe decoder; the
    explode-shaped output schema is the part that matters downstream.
    """

    def run(batches):
        for pdf in batches:
            ids, fnos, offs, frames = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                payload = bytes(b) if b is not None else b""
                for fno in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    off = fno * every_n_bytes
                    ids.append(int(i))
                    fnos.append(fno)
                    offs.append(off)
                    frames.append(payload[off : off + every_n_bytes])
            yield pd.DataFrame(
                {"id": ids, "frame_no": fnos, "offset": offs, "frame": frames}
            )

    return media.mapInPandas(run, "id long, frame_no int, offset long, frame binary")
