"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata; all
compute is Arrow-batched ``mapInPandas`` with explicit output schemas so
partitioning/batching behave identically under any codec.

The codec (round 3): a REAL dependency-free decoder for the
uncompressed raster formats — BMP (BITMAPINFOHEADER, 24/32-bit BI_RGB,
bottom-up or top-down) and PPM/PGM (binary P6/P5, maxval ≤ 255) — with
an 8-dim pixel-statistics feature vector. ``strict=True`` decodes for
real and raises NotImplementedError only for formats that genuinely
need an external library (JPEG/PNG/...); ``strict=False`` decodes
recognized formats and falls back to the deterministic md5 fake for
anything else (so arbitrary-bytes tests stay stable).

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
    """Deterministic stand-in for unrecognized formats: dimensions and a
    feature vector derived purely from the payload bytes via md5."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feat = np.frombuffer(hashlib.md5(payload + b"f").digest()[:IMAGE_FEATURE_DIM], dtype=np.uint8)
    return width, height, (feat / 255.0).astype(np.float32)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER or later, 24/32-bit BI_RGB) →
    HxWx3 uint8 RGB. Handles bottom-up (positive height) and top-down
    rows and the 4-byte row padding. Raises ValueError on anything the
    format allows but this decoder does not (palettes, RLE, 16-bit)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pix_off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (need BITMAPINFOHEADER+)")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (need BI_RGB)")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp} (need 24 or 32)")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    top_down = height < 0
    h = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    need = pix_off + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} bytes, need {need}")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = rows.reshape(h, stride)[:, : width * bytes_pp].reshape(h, width, bytes_pp)
    rgb = rows[..., 2::-1]  # stored BGR(A) → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray broadcast to RGB) with
    maxval ≤ 255 → HxWx3 uint8. Header tokens may be separated by any
    whitespace and '#' comments per the netpbm spec."""
    if len(data) < 2 or data[:1] != b"P" or data[1:2] not in b"56":
        raise ValueError("not a binary PPM/PGM file")
    kind = data[:2]
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(data[start:pos]))
    width, height, maxval = vals
    if maxval > 255 or maxval <= 0 or width <= 0 or height <= 0:
        raise ValueError(f"unsupported PNM geometry {width}x{height} maxval={maxval}")
    ch = 3 if kind == b"P6" else 1
    need = width * height * ch
    # single whitespace after maxval, then raster — except Windows-written
    # files, whose header ends in \r\n: treat that pair as the separator
    # (otherwise the \n becomes pixel (0,0) and every pixel shifts by one).
    # Disambiguated by LENGTH: prefer the 2-byte consume whenever the
    # raster still fits after it (surplus bytes are trailing junk —
    # ADVICE r4: requiring an EXACT fit mis-shifted \r\n files with any
    # trailing bytes); fall back to a bare-'\r' separator only when
    # consuming 2 would truncate the raster (first raster byte is 0x0A).
    if data[pos : pos + 2] == b"\r\n" and len(data) - pos - 2 >= need:
        pos += 2
    else:
        pos += 1
    if len(data) - pos < need:
        raise ValueError(f"truncated PNM raster: {len(data) - pos} bytes, need {need}")
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos).reshape(height, width, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffing decode → HxWx3 uint8 RGB. Raises
    NotImplementedError for real-but-unsupported formats (JPEG/PNG/GIF/
    WEBP need external codecs) and ValueError for unrecognized bytes."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:1] == b"P" and payload[1:2] in b"56":
        return decode_pnm(payload)
    for magic, name in (
        (b"\xff\xd8\xff", "JPEG"),
        (b"\x89PNG", "PNG"),
        (b"GIF8", "GIF"),
        (b"RIFF", "WEBP/RIFF"),
    ):
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decode requires an external codec (PIL/libvips) — "
                "not available in this container; use BMP/PPM or strict=False"
            )
    raise ValueError("unrecognized image format")


def image_feature_vector(px: np.ndarray) -> np.ndarray:
    """8-dim pixel-statistics feature for an HxWx3 uint8 image:
    [mean_r, mean_g, mean_b, mean_gray, std_gray (all /255),
     width/1024, height/1024, aspect=min/max]. Deterministic float32."""
    h, w = px.shape[:2]
    fpx = px.astype(np.float64)
    means = fpx.reshape(-1, 3).mean(axis=0) / 255.0
    gray = fpx[..., 0] * 0.299 + fpx[..., 1] * 0.587 + fpx[..., 2] * 0.114
    return np.array(
        [
            means[0], means[1], means[2],
            gray.mean() / 255.0, gray.std() / 255.0,
            w / 1024.0, h / 1024.0, min(w, h) / max(w, h),
        ],
        dtype=np.float32,
    )


def _decode_any(payload: bytes, strict: bool) -> tuple[int, int, np.ndarray]:
    try:
        px = decode_image(payload)
    except (NotImplementedError, ValueError):
        if strict:
            raise
        return _fake_decode(payload)
    h, w = px.shape[:2]
    return w, h, image_feature_vector(px)


def image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract images, Arrow-batched. BMP/PPM/PGM decode
    for real (pure numpy, see decode_image); ``strict=True`` raises on
    anything else, ``strict=False`` falls back to the md5 fake so opaque
    payloads still flow through the plumbing."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = _decode_any(bytes(payload), strict)
                rows.append((mid, w, h, len(payload), [float(x) for x in feat]))
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
