"""Property-style round-trips for the posting codecs (SURVEY §5 rebuild plan:
encode∘decode = id on random and adversarial gaps)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conveyorbelt_spark.functions.codecs import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr))
    assert out.tolist() == vals


def test_varint_adversarial():
    edges = [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**21, 2**28, 2**35, 2**63, 2**64 - 1]
    arr = np.array(edges, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == edges


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=200).map(
        lambda gaps: np.cumsum(np.array(gaps, dtype=np.uint64))
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(sorted_vals):
    out = delta_decode(delta_encode(sorted_vals))
    assert np.array_equal(out, sorted_vals)


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.uint64)) == b""


def test_count_mismatch_raises():
    data = varint_encode(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(ValueError):
        varint_decode(data, count=2)


# --------------------------------------------------------------------------
# PNG (stdlib zlib + full unfilter) — closes the last compressed-image stub
# --------------------------------------------------------------------------

def _png_chunks(ihdr_body, idat_raw, plte=None):
    import struct
    import zlib

    from conveyorbelt_spark.sources.multimodal import PNG_SIG

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    out = PNG_SIG + chunk(b"IHDR", ihdr_body)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")


def test_png_roundtrip_all_filters():
    """encode_png cycles rows through all five filter types, so the
    round-trip exercises every unfilter path — bit-exact."""
    import numpy as np

    from conveyorbelt_spark.sources.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    for h, w in ((1, 1), (5, 3), (13, 17), (32, 24)):
        px = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px), (h, w)


def test_png_rgb_and_rgba_luma_matches_bmp_rule():
    """Color PNG → the same pinned integer luma as the BMP decoder."""
    import struct

    import numpy as np

    from conveyorbelt_spark.sources.multimodal import decode_png

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    r64 = rgb.astype(np.int64)
    want = (299 * r64[:, :, 0] + 587 * r64[:, :, 1] + 114 * r64[:, :, 2]) // 1000
    # color type 2 (RGB), filter 0 rows
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(4))
    p = _png_chunks(struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0), raw)
    assert np.array_equal(decode_png(p), want.astype(np.uint8))
    # color type 6 (RGBA): alpha ignored
    rgba = np.concatenate([rgb, np.full((4, 6, 1), 200, np.uint8)], axis=2)
    raw = b"".join(b"\x00" + rgba[r].tobytes() for r in range(4))
    p = _png_chunks(struct.pack(">IIBBBBB", 6, 4, 8, 6, 0, 0, 0), raw)
    assert np.array_equal(decode_png(p), want.astype(np.uint8))


def test_png_palette():
    import struct

    import numpy as np

    from conveyorbelt_spark.sources.multimodal import decode_png

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
    p = _png_chunks(
        struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0), raw, plte=pal.tobytes()
    )
    p64 = pal[idx].astype(np.int64)
    want = (299 * p64[:, :, 0] + 587 * p64[:, :, 1] + 114 * p64[:, :, 2]) // 1000
    assert np.array_equal(decode_png(p), want.astype(np.uint8))


def test_png_dispatch_and_guards():
    import struct

    import numpy as np
    import pytest as _pytest

    from conveyorbelt_spark.sources.multimodal import decode_image, decode_png, encode_png

    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert np.array_equal(decode_image(encode_png(px)), px)  # dispatch by magic
    with _pytest.raises(ValueError):
        decode_png(b"nope")
    # 16-bit depth and Adam7 are honest NotImplemented guards
    raw = b"\x00" + b"\x00" * 16
    p16 = _png_chunks(struct.pack(">IIBBBBB", 8, 1, 16, 0, 0, 0, 0), raw)
    with _pytest.raises(NotImplementedError):
        decode_png(p16)
    pi = _png_chunks(struct.pack(">IIBBBBB", 8, 1, 8, 0, 0, 0, 1), b"\x00" + b"\x00" * 8)
    with _pytest.raises(NotImplementedError):
        decode_png(pi)


def test_png_feeds_image_features(spark):
    """PNG payloads flow through the Arrow feature kernel like BMPs."""
    import numpy as np

    from conveyorbelt_spark.sources.multimodal import encode_png, image_features

    rng = np.random.RandomState(3)
    rows = []
    for i in range(4):
        px = rng.randint(0, 256, size=(16 + i, 20), dtype=np.uint8)
        rows.append((i, "image", encode_png(px), {}))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    got = {r.media_id: r for r in image_features(df).collect()}
    assert len(got) == 4
    assert got[0].width == 20 and got[0].height == 16
