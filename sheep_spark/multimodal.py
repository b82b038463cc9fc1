"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata; all
compute is Arrow-batched ``mapInPandas`` with explicit output schemas so
partitioning/batching behave identically to a real decoder. The actual
codec step is STUBBED (no image/audio libs in this container): by
default a deterministic fake derived from the bytes (so tests are
stable); ``strict=True`` raises NotImplementedError where a real
decoder (PIL/ffmpeg) would plug in.

Schemas:
  media(media_id long, kind string, payload binary, mime string)
  image_features(media_id long, width int, height int, n_bytes long,
                 feature array<float>)
  frames(media_id long, frame_no int, frame binary)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, feature array<float>"
)
FRAMES_SCHEMA = "media_id long, frame_no int, frame binary"


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for image decode: dimensions and a feature
    vector derived purely from the payload bytes via md5."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feat = np.frombuffer(hashlib.md5(payload + b"f").digest()[:IMAGE_FEATURE_DIM], dtype=np.uint8)
    return width, height, (feat / 255.0).astype(np.float32)


def image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract images, Arrow-batched. Real plumbing,
    stubbed codec (see module docstring)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL/libvips — not available in this container"
            )
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = _fake_decode(bytes(payload))
                rows.append((mid, w, h, len(payload), feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "feature"]
            )

    return media.select("media_id", "payload").mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits ≤max_frames
    byte-slices per media row (stand-in for keyframe extraction);
    output is exploded — one row per frame — exercising the 1→N shape
    a real sampler has."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    out.append((mid, i, data[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "frame"])

    return media.select("media_id", "payload").mapInPandas(fn, FRAMES_SCHEMA)
