"""Pure-Python XXH64 — driver-side twin of Spark's ``F.xxhash64``.

Spark's xxhash64 is the public XXH64 algorithm (Cyan4973/xxHash spec) with
seed 42, applied to the UTF-8 bytes of a string (Spark hashes the raw bytes
of the UTF8String). Having it in Python lets the query planner compute
``doc_id``s and term-hash buckets on the driver with ZERO Spark jobs —
dictionary and segment scans are then partition-pruned before any job runs.

Verified bit-for-bit against ``F.xxhash64`` in tests/test_hashing.py.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * PRIME1) + PRIME4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def spark_xxhash64(s: str | bytes, seed: int = SPARK_SEED) -> int:
    """Signed-long twin of Spark's ``F.xxhash64(col)`` on a string column."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    h = xxh64(b, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def doc_id_of(url: str) -> int:
    """Twin of functions.tokenize.with_doc_id: xxhash64(url) >>> 1."""
    return (spark_xxhash64(url) & MASK64) >> 1


def term_bucket(term: str, n_term_buckets: int) -> int:
    """Twin of the index's tb column: pmod(xxhash64(term), n_term_buckets)."""
    return spark_xxhash64(term) % n_term_buckets  # Python % is already pmod
