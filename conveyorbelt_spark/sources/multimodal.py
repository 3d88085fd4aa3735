"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as Arrow
kernels over mapInPandas.

The container has no image/audio libraries, so REAL codec decode is stubbed:
``decode_image``/``decode_video`` first try PIL/av (absent here), then fall
back to the deterministic CB-synthetic formats below, else raise
NotImplementedError. Everything Spark-side — schemas, partitioning, UDF
signatures, Arrow batch shapes, the numpy resize/feature math — is real and
tested.

Synthetic formats (deterministic, used by tests and the corpus generator):
- image: b'CBIM' + width:u16 + height:u16 + seed:u32  → pixels are a seeded
  uint8 array of shape (h, w)
- video: b'CBVD' + n_frames:u16 + width:u16 + height:u16 + seed:u32
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_MAGIC = b"CBIM"
VIDEO_MAGIC = b"CBVD"

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta map<string,string>"


def synth_image(width: int, height: int, seed: int) -> bytes:
    return IMAGE_MAGIC + struct.pack("<HHI", width, height, seed)


def synth_video(n_frames: int, width: int, height: int, seed: int) -> bytes:
    return VIDEO_MAGIC + struct.pack("<HHHI", n_frames, width, height, seed)


def _pixels(width: int, height: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, size=(height, width), dtype=np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """payload → (h, w) uint8 array. Real-codec path STUBBED (no PIL in this
    container); CB-synthetic format decodes deterministically."""
    try:  # real path, absent here by design
        from PIL import Image  # noqa: F401

        raise NotImplementedError("PIL present but real decode intentionally unwired in v1")
    except ImportError:
        pass
    if payload[:4] == IMAGE_MAGIC:
        w, h, seed = struct.unpack("<HHI", payload[4:12])
        return _pixels(w, h, seed)
    raise NotImplementedError("no image codec available for this payload")


def decode_video(payload: bytes) -> list[np.ndarray]:
    if payload[:4] == VIDEO_MAGIC:
        n, w, h, seed = struct.unpack("<HHHI", payload[4:14])
        return [_pixels(w, h, seed + i) for i in range(n)]
    raise NotImplementedError("no video codec available for this payload")


def synth_media_df(spark, n_images: int = 20, n_videos: int = 5, seed: int = 42) -> DataFrame:
    rows = []
    for i in range(n_images):
        w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 8
        rows.append((i, "image", synth_image(w, h, seed + i), {"w": str(w), "h": str(h)}))
    for j in range(n_videos):
        rows.append(
            (n_images + j, "video", synth_video(8, 32, 24, seed + 1000 + j), {"frames": "8"})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# Operators (Arrow kernels — real plumbing)
# --------------------------------------------------------------------------

def image_features(df: DataFrame) -> DataFrame:
    """→ (media_id, width, height, mean_px, std_px, ahash): decode + basic
    features + 64-bit average-hash (the pHash-family fingerprint used for
    image near-dup)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload)).astype(np.float64)
                h, w = px.shape
                # average hash: 8x8 downsample vs mean → 64 bits
                ys = np.linspace(0, h, 9).astype(int)
                xs = np.linspace(0, w, 9).astype(int)
                blocks = np.array(
                    [
                        px[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
                        for r in range(8)
                        for c in range(8)
                    ]
                )
                bits = (blocks > blocks.mean()).astype(np.uint64)
                ahash = int((bits << np.arange(64, dtype=np.uint64)).sum()) & ((1 << 63) - 1)
                rows.append((mid, w, h, float(px.mean()), float(px.std()), ahash))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_px", "std_px", "ahash"]
            )

    return df.where(df.kind == "image").select("media_id", "payload").mapInPandas(
        run, schema="media_id long, width int, height int, mean_px double, std_px double, ahash long"
    )


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """→ (media_id, pixels array<int>): nearest-neighbor resize (real numpy
    math on the decoded array), flattened row-major."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w = px.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = px[yi][:, xi]
                rows.append((mid, small.flatten().astype(int).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "pixels"])

    return df.where(df.kind == "image").select("media_id", "payload").mapInPandas(
        run, schema="media_id long, pixels array<int>"
    )


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """video rows → one row per sampled frame: (media_id, frame_idx,
    frame_mean) — the UDTF (1 blob → N rows) shape of the reference's
    parsers applied to media."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_video(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    rows.append((mid, idx, float(frames[idx].mean())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_mean"])

    return df.where(df.kind == "video").select("media_id", "payload").mapInPandas(
        run, schema="media_id long, frame_idx int, frame_mean double"
    )
