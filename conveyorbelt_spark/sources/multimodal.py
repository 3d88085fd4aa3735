"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as Arrow
kernels over mapInPandas.

REAL decode paths (pure numpy/struct — no external libraries needed):
- **BMP** (Windows bitmap, BI_RGB uncompressed, 8-bit paletted or 24-bit):
  full header parse, bottom-up/top-down rows, 4-byte row padding, palette
  lookup, pinned integer luma for grayscale.
- **PNG** (stdlib zlib): chunk walk, inflate, full unfilter
  (None/Sub/Up/Average/Paeth), color types 0/2/3/4/6 at 8-bit depth,
  pinned integer luma.
- **WAV** (RIFF PCM, 8/16-bit, any channel count): chunk walk, sample
  decode, per-file audio features.
Remaining compressed formats (JPEG/MP4...) fall through to PIL when
present (absent in this container) else raise NotImplementedError —
clearly the only remaining stub.

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


# --------------------------------------------------------------------------
# Real codecs (dependency-free)
# --------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → 24-bit BI_RGB BMP bytes (R=G=B), bottom-up
    rows with 4-byte padding — a REAL file decodable by any image viewer."""
    h, w = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_bytes - w * 3)
    for r in range(h - 1, -1, -1):  # bottom-up
        row = np.repeat(pixels[r], 3).astype(np.uint8)  # B=G=R
        body += row.tobytes() + pad
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP (BI_RGB, 8-bit paletted or 24-bit) → (h, w) uint8 grayscale.
    Handles bottom-up AND top-down rows and the 4-byte row padding; color
    → pinned integer luma (299R + 587G + 114B) // 1000."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_raw = struct.unpack("<ii", payload[18:26])
    bpp, compression = struct.unpack("<HI", payload[28:34])
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) not supported")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp == 24:
        row_bytes = (w * 3 + 3) & ~3
        raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
        rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        bgr = rows.astype(np.uint32)
        gray = (299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0]) // 1000
    elif bpp == 8:
        pal_off = 14 + hdr_size
        pal = np.frombuffer(payload, dtype=np.uint8, count=256 * 4, offset=pal_off).reshape(
            256, 4
        )
        row_bytes = (w + 3) & ~3
        raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
        idx = raw.reshape(h, row_bytes)[:, :w]
        bgr = pal[idx].astype(np.uint32)
        gray = (299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0]) // 1000
    else:
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    gray = gray.astype(np.uint8)
    return gray if top_down else gray[::-1]


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → PNG bytes (stdlib zlib, no PIL). Rows cycle
    through ALL FIVE filter types (None/Sub/Up/Average/Paeth) so a
    round-trip exercises every decoder unfilter path — a REAL file any
    viewer opens."""
    import zlib

    px = pixels.astype(np.uint8)
    h, w = px.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for r in range(h):
        row = px[r].astype(np.int64)
        f = r % 5
        left = np.concatenate(([0], row[:-1]))
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            filt = row - left
        elif f == 2:  # Up
            filt = row - prev
        elif f == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            ul = np.concatenate(([0], prev[:-1]))
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = row - pred
        raw.append(f)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w) uint8 grayscale, stdlib-only (zlib inflate + full
    unfilter: None/Sub/Up/Average/Paeth). 8-bit depth, color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), interlace 0.
    Color → the same pinned integer luma as the BMP path. Sub rows
    unfilter via per-lane cumsum; Average/Paeth rows walk pixels (a true
    sequential recurrence — per-payload codec work is inherently serial;
    the parallelism axis is payloads per Arrow batch)."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG not supported (8-bit only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if ch is None:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG data truncated")
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    ftypes, data = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        f, row = int(ftypes[r]), data[r]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: rec[x] = row[x] + rec[x-ch] → per-lane cumsum
            rec = row.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential recurrence
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 3:
                    rec[x] = (row[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = rec
        prev = rec
    px = out.reshape(h, w, ch)
    if ctype == 0:
        gray = px[:, :, 0]
    elif ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        rgb = plte[px[:, :, 0]].astype(np.int64)
        gray = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    elif ctype == 4:
        gray = px[:, :, 0]  # alpha ignored
    else:  # 2 / 6: RGB(A) → pinned luma, alpha ignored
        gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    return gray.astype(np.uint8)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF PCM WAV bytes — a REAL playable file."""
    s = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(s)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(s)) + s
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF PCM WAV → (samples float64 in [-1, 1] shaped (n, channels),
    sample_rate, n_channels). 8-bit unsigned and 16-bit signed PCM."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_format}) not supported")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n = len(x) // n_ch
    return x[: n * n_ch].reshape(n, n_ch), rate, n_ch


def decode_image(payload: bytes) -> np.ndarray:
    """payload → (h, w) uint8 grayscale. Dispatch: CB-synthetic → BMP →
    PNG → baseline JPEG (all real, dependency-free — see ``jpegcodec``) →
    PIL for the rest (progressive JPEG, WebP, …) when installed (absent in
    this container) → NotImplementedError."""
    payload = bytes(payload)
    if payload[:4] == IMAGE_MAGIC:
        w, h, seed = struct.unpack("<HHI", payload[4:12])
        return _pixels(w, h, seed)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            pass  # progressive/arithmetic → PIL fallback below
    try:  # remaining compressed formats — needs PIL, absent here
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    except ImportError:
        pass
    raise NotImplementedError(
        "no codec for this image payload (progressive JPEG/WebP/... need PIL)"
    )


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


def audio_features(df: DataFrame) -> DataFrame:
    """audio rows → (media_id, sample_rate, n_channels, duration_s, rms,
    peak): real WAV decode + signal features per file."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, rate, n_ch = decode_wav(bytes(payload))
                mono = x.mean(axis=1)
                rows.append(
                    (
                        mid, rate, n_ch,
                        float(len(mono) / rate),
                        float(np.sqrt((mono**2).mean())) if len(mono) else 0.0,
                        float(np.abs(mono).max()) if len(mono) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_channels", "duration_s", "rms", "peak"],
            )

    return df.where(df.kind == "audio").select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, sample_rate int, n_channels int, duration_s double, "
            "rms double, peak double"
        ),
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
