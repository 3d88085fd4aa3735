"""Multimodal plumbing: schema, batch shape, determinism (decode stubbed by
the CB-synthetic formats — real codecs absent by design)."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.sources.multimodal import (
    decode_image,
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
