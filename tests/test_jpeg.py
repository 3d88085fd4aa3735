"""Baseline JPEG codec (pure numpy — ITU-T T.81 subset): encoder/decoder
round trips at lossy-but-bounded error, restart-marker resync, sampling
layouts, honest rejection of non-baseline streams, and the Spark
image_features plumbing over JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from conveyorbelt_spark.sources.jpegcodec import decode_jpeg, encode_jpeg
from conveyorbelt_spark.sources.multimodal import decode_image


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    return 10 * np.log10(255.0**2 / max(err.mean(), 1e-12))


def test_uniform_gray_roundtrip_exact():
    px = np.full((24, 33), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == (24, 33)
    assert int(np.abs(out.astype(int) - 128).max()) == 0


def test_gray_roundtrip_psnr():
    rng = np.random.RandomState(3)
    px = (np.linspace(0, 255, 64)[None, :] * np.ones((48, 1))).astype(np.uint8)
    px = np.clip(px.astype(int) + rng.randint(-12, 12, px.shape), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == px.shape
    assert _psnr(out, px) > 30.0


@pytest.mark.parametrize("subsample", [False, True])
def test_color_decodes_to_luma(subsample):
    """4:4:4 and 4:2:0 color streams decode; output is the luma plane
    (JFIF Y), compared against the true luma of the source RGB."""
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (30, 41, 3)).astype(np.uint8)
    lum = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    out = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=subsample))
    assert out.shape == (30, 41)
    assert _psnr(out, lum) > 30.0


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_marker_resync(ri):
    """DRI/RSTn streams decode identically: predictor resets and byte
    alignment at every interval."""
    rng = np.random.RandomState(5)
    px = (np.linspace(0, 255, 80)[None, :] * np.ones((56, 1))).astype(np.uint8)
    px = np.clip(px.astype(int) + rng.randint(-10, 10, px.shape), 0, 255).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(px, quality=90))
    with_rst = decode_jpeg(encode_jpeg(px, quality=90, restart_interval=ri))
    assert _psnr(with_rst, px) > 30.0
    # restart markers change packaging, not content
    assert np.array_equal(plain, with_rst)


def test_odd_sizes_edge_replication():
    for shape in ((1, 1), (7, 9), (17, 8), (8, 17)):
        px = np.arange(np.prod(shape), dtype=np.int64).reshape(shape) % 256
        out = decode_jpeg(encode_jpeg(px.astype(np.uint8), quality=95))
        assert out.shape == shape


def test_non_baseline_rejected_not_misdecoded():
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_jpeg(px))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    # dispatcher propagates honestly (no PIL in this container)
    with pytest.raises(NotImplementedError):
        decode_image(bytes(data))


def test_image_features_over_jpeg_payloads(spark):
    """The Spark plumbing end-to-end: JPEG payloads flow through
    image_features (mapInPandas Arrow batches) like BMP/PNG ones."""
    from conveyorbelt_spark.sources.multimodal import MEDIA_SCHEMA, image_features

    rng = np.random.RandomState(11)
    rows = []
    for i in range(6):
        px = rng.randint(0, 256, (16 + 4 * i, 24)).astype(np.uint8)
        rows.append((i, "image", encode_jpeg(px, quality=90), {"fmt": "jpeg"}))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(df).collect()}
    assert set(got) == set(range(6))
    for i in range(6):
        assert (got[i].height, got[i].width) == (16 + 4 * i, 24)
        assert 0.0 <= got[i].mean_px <= 255.0
