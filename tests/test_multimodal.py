"""Multimodal: REAL dependency-free codecs (BMP 8/24-bit, WAV PCM) +
feature/resize/frame-sample kernels; compressed formats (JPEG/PNG) remain
the only stub (need PIL, absent by design)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from conveyorbelt_spark.sources.multimodal import (
    audio_features,
    decode_bmp,
    decode_image,
    decode_wav,
    encode_bmp,
    encode_wav,
    image_features,
    resize_images,
    sample_frames,
    synth_image,
    synth_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media_df(spark, n_images=12, n_videos=4).repartition(4)


def test_image_features(media):
    rows = {r.media_id: r for r in image_features(media).collect()}
    assert len(rows) == 12
    r = rows[0]
    assert (r.width, r.height) == (32, 24)
    assert 0 <= r.mean_px <= 255 and r.std_px > 0
    assert r.ahash > 0


def test_features_deterministic(media):
    a = sorted((r.media_id, r.ahash) for r in image_features(media).collect())
    b = sorted((r.media_id, r.ahash) for r in image_features(media).collect())
    assert a == b


def test_resize(media):
    rows = resize_images(media, 8, 8).collect()
    assert len(rows) == 12
    assert all(len(r.pixels) == 64 for r in rows)
    px = decode_image(synth_image(32, 24, 42))
    got = next(r.pixels for r in rows if r.media_id == 0)
    assert got[0] == int(px[0, 0])  # nearest-neighbor anchors top-left


def test_sample_frames(media):
    rows = sample_frames(media, every_n=2).collect()
    # 4 videos × 8 frames sampled every 2 → 4 per video
    assert len(rows) == 16
    assert {r.frame_idx for r in rows} == {0, 2, 4, 6}


def test_unknown_payload_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"JPEGnotsupported")


# --------------------------------------------------------------------------
# REAL codecs: BMP + WAV (pure numpy/struct)
# --------------------------------------------------------------------------

def test_bmp_roundtrip_exact():
    """encode → decode reproduces the exact pixel array, including widths
    that force 4-byte row padding."""
    for w, h in [(7, 5), (8, 8), (33, 17)]:
        px = np.random.RandomState(w * h).randint(0, 256, size=(h, w), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all(), (w, h)


def test_bmp_topdown_and_8bit():
    # top-down: negative height in the info header
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = bytearray(encode_bmp(px))
    # flip to top-down by negating height AND reordering rows
    bottom_up = decode_bmp(bytes(b))
    b[22:26] = struct.pack("<i", -3)
    top_down = decode_bmp(bytes(b))
    assert (top_down == bottom_up[::-1]).all()

    # 8-bit paletted: grayscale palette, identity indices
    w, h = 5, 3
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    row_bytes = (w + 3) & ~3
    idx = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    body = b"".join(idx[r].tobytes() + b"\x00" * (row_bytes - w) for r in range(h - 1, -1, -1))
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
    assert (decode_bmp(hdr + info + pal + body) == idx).all()


def test_bmp_through_image_pipeline(spark):
    """A real BMP payload flows through the same feature/resize kernels as
    the synthetic format — decode is no longer a stub."""
    px = np.random.RandomState(3).randint(0, 256, size=(24, 32), dtype=np.uint8)
    df = spark.createDataFrame(
        [(100, "image", encode_bmp(px), {"fmt": "bmp"})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    r = image_features(df).collect()[0]
    assert (r.width, r.height) == (32, 24)
    assert abs(r.mean_px - float(px.mean())) < 1e-9
    small = resize_images(df, 4, 4).collect()[0]
    assert len(small.pixels) == 16


def test_wav_roundtrip_and_features(spark):
    """Sine-wave PCM16 WAV: decoded features match signal theory (RMS of a
    sine = amplitude/√2) and the Spark kernel agrees."""
    rate, secs, amp = 8000, 2, 0.5
    t = np.arange(rate * secs) / rate
    samples = (amp * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    wav = encode_wav(samples, rate)
    x, r, ch = decode_wav(wav)
    assert (r, ch) == (rate, 1) and len(x) == rate * secs

    df = spark.createDataFrame(
        [(200, "audio", wav, {"fmt": "wav"})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    f = audio_features(df).collect()[0]
    assert f.sample_rate == rate and f.n_channels == 1
    assert abs(f.duration_s - secs) < 1e-9
    assert abs(f.rms - amp / np.sqrt(2)) < 0.01
    assert abs(f.peak - amp) < 0.01


def test_wav_8bit_and_nonpcm():
    x8 = encode_wav(np.zeros(10, dtype=np.int16), 8000)
    # rewrite bits-per-sample to something unsupported
    bad = bytearray(x8)
    bad[34:36] = struct.pack("<H", 24)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))
