"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/DSP kernels themselves (PIL, ffmpeg, torchaudio...) are NOT in
this container, so the actual byte -> pixels/samples step is stubbed — but
every piece of Spark-side plumbing is real and tested: schemas, Arrow batch
shapes, ``mapInPandas`` iteration, partition sizing, metadata extraction
from magic bytes, and a deterministic fake feature extractor so downstream
(dedup / ANN over features) is exercised end-to-end.

To productionize: replace ``_decode_image_bytes`` with a real decoder; the
Arrow batch contract (bytes in -> fixed-width float vector out) is already
what the real kernel needs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "media_metadata",
    "fake_image_features",
    "decode_images",
    "resize_images",
    "sample_frames",
    "audio_features",
    "MEDIA_META_SCHEMA",
    "FEATURE_DIM",
]

FEATURE_DIM = 16

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("magic", StringType()),
    ]
)

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"GIF8": "image/gif",
}


def _sniff(b: bytes | None) -> str:
    if not b:
        return "unknown"
    for magic, mt in _MAGIC.items():
        if b.startswith(magic):
            return mt
    return "application/octet-stream"


def media_metadata(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Typed metadata over an opaque binary column via mapInPandas (one
    Arrow batch per call — the shape a real decoder uses)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "media_type": [
                        _sniff(bytes(b) if b is not None else None)
                        for b in payload
                    ],
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in payload
                    ],
                    "magic": [
                        bytes(b[:4]).hex() if b else "" for b in payload
                    ],
                }
            )

    return df.mapInPandas(gen, MEDIA_META_SCHEMA)


def _decode_image_bytes(b: bytes):
    """STUB: real image decode requires PIL/libjpeg, absent here."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "container; wire PIL/torchvision here. The surrounding Arrow "
        "plumbing (batching, schema, partitioning) is real and tested "
        "via fake_image_features()."
    )


def fake_image_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Deterministic stand-in feature extractor: FEATURE_DIM floats derived
    from md5 of the bytes. Exercises the exact batch shape / schema /
    shuffle behaviour a real CNN/CLIP featurizer would have."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bin_col]:
                h = hashlib.md5(bytes(b) if b is not None else b"").digest()
                feats.append(
                    [
                        (h[i % 16] - 127.5) / 127.5
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype(str), "feature": feats}
            )

    return df.mapInPandas(gen, _FEATURE_SCHEMA)


def _fake_floats(b: bytes, n: int, salt: bytes = b"") -> list[float]:
    """n deterministic floats in [-1, 1) from md5(salt || bytes) — the
    stand-in for any decode kernel's numeric output."""
    out: list[float] = []
    counter = 0
    while len(out) < n:
        h = hashlib.md5(salt + counter.to_bytes(4, "big") + b).digest()
        out.extend((x - 127.5) / 127.5 for x in h)
        counter += 1
    return out[:n]


def resize_images(
    df: DataFrame,
    height: int = 8,
    width: int = 8,
    channels: int = 1,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    kernel: str = "fake",
) -> DataFrame:
    """Decode + resize plumbing: bytes -> fixed (height*width*channels)
    float pixel vector per image. ``kernel='fake'`` uses the
    deterministic stand-in (the Arrow batch contract — bytes in, fixed-
    width float array out — is exactly what a PIL/torchvision kernel
    needs); ``kernel='real'`` raises until an image library is wired in."""
    n_px = height * width * channels
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("height", LongType()),
            StructField("width", LongType()),
            StructField("pixels", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for b in pdf[bin_col]:
                raw = bytes(b) if b is not None else b""
                if kernel == "real":
                    _decode_image_bytes(raw)
                pixels.append(_fake_floats(raw, n_px, b"px:"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "height": height,
                    "width": width,
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(gen, schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to
    ``n_frames`` rows ``(doc_id, frame_idx, feature)`` — the 1->N Arrow
    batch shape a real ffmpeg/decord sampler produces. Frame features are
    the deterministic stand-in, keyed by (bytes, frame_idx)."""
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("frame_idx", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for doc, b in zip(pdf[id_col].astype(str), pdf[bin_col]):
                raw = bytes(b) if b is not None else b""
                for i in range(n_frames):
                    ids.append(doc)
                    idxs.append(i)
                    feats.append(
                        _fake_floats(raw, FEATURE_DIM, b"frame:%d:" % i)
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "feature": feats}
            )

    return df.mapInPandas(gen, schema)


def audio_features(
    df: DataFrame,
    n_coeffs: int = 13,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Audio feature plumbing: bytes -> (doc_id, n_bytes, coeffs) with a
    fixed-width MFCC-shaped float vector (deterministic stand-in; wire
    torchaudio/librosa at the marked kernel to productionize)."""
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("n_bytes", LongType()),
            StructField("coeffs", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in pdf[bin_col]
                    ],
                    "coeffs": [
                        _fake_floats(
                            bytes(b) if b is not None else b"",
                            n_coeffs,
                            b"mfcc:",
                        )
                        for b in pdf[bin_col]
                    ],
                }
            )

    return df.mapInPandas(gen, schema)


def decode_images(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Real-decoder entry point (stubbed kernel — raises on execution,
    by design; see module docstring)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for b in pdf[bin_col]:
                _decode_image_bytes(bytes(b) if b is not None else b"")
            yield pdf  # pragma: no cover

    return df.mapInPandas(gen, df.schema)
