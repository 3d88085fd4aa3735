"""Posting-list codecs: delta-gap + varint, numpy-vectorized.

These are the compression kernels the reference delegates to Elasticsearch
(north_rule: "delta-gap + varint-compressed posting blocks"). Everything is
vectorized over whole arrays — the inner loops run over *byte positions*
(≤10 iterations), never over rows.

Encoding: LEB128 varint (7 data bits/byte, high bit = continuation), values
are uint64. Posting docIDs are encoded as gaps: first value absolute, then
``doc[i] - doc[i-1]`` (inputs strictly increasing ⇒ gaps ≥ 1). Each block is
independently decodable (its first docID is absolute), which is what makes
bucket-ordered block concatenation a zero-cost merge.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode_ex(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array to LEB128. Returns (uint8 buffer, bytes-per-value).

    The per-value byte lengths let a caller encode a whole partition in one
    vectorized call and then slice out per-block byte ranges for free."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bit_length/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(1)
        nz = tmp > 0
    nbytes = np.maximum((nbits + 6) // 7, 1)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    tmp = v.copy()
    max_len = int(nbytes.max())
    for j in range(max_len):
        sel = nbytes > j  # values that still have a byte at position j
        pos = starts[sel] + j
        byte = (tmp[sel] & _MASK7).astype(np.uint8)
        more = (j + 1) < nbytes[sel]
        out[pos] = byte | np.where(more, _CONT, np.uint8(0))
        tmp[sel] >>= np.uint64(7)
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to LEB128 bytes (vectorized)."""
    out, _ = varint_encode_ex(values)
    return out.tobytes()


def varint_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes to a uint64 array (vectorized)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = buf < 0x80
    ends = np.flatnonzero(is_end)  # index of terminal byte of each value
    n = ends.size
    if count is not None and n != count:
        raise ValueError(f"varint stream holds {n} values, expected {count}")
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for j in range(max_len):
        sel = lengths > j
        byte = buf[starts[sel] + j].astype(np.uint64)
        out[sel] |= (byte & _MASK7) << np.uint64(7 * j)
    return out


def delta_encode(sorted_vals: np.ndarray) -> bytes:
    """Delta-gap + varint encode a strictly-increasing uint64 array."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    gaps[1:] = v[1:] - v[:-1]
    return varint_encode(gaps)


def delta_decode(data: bytes, count: int | None = None) -> np.ndarray:
    gaps = varint_decode(data, count)
    return np.cumsum(gaps, dtype=np.uint64)
