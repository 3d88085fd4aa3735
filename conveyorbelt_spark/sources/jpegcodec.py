"""Dependency-free baseline JPEG codec (numpy + stdlib only).

A 100 TB Common-Crawl-style multimodal corpus is mostly JPEG; stubbing the
format behind an absent PIL would silently limit ``image_features``/ahash
coverage to BMP/PNG. This module implements the BASELINE SEQUENTIAL subset
of ITU-T T.81 (the public JPEG spec) that covers the overwhelming majority
of web JPEGs:

decode (``decode_jpeg``):
- marker walk: SOI, APPn/COM (skipped), DQT (8-bit tables), SOF0/SOF1,
  DHT, DRI, SOS, EOI
- canonical Huffman decoding (the spec's mincode/maxcode/valptr algorithm)
  over the de-stuffed entropy segment, restart markers (RSTn) honored
- any sampling layout expressible with h/v factors 1-2 per component
  (grayscale, 4:4:4, 4:2:2, 4:2:0), interleaved single-scan
- dequantize → de-zigzag → 8×8 IDCT (one numpy matmul pair per block,
  DCT-III basis) → level shift
- output is the LUMA plane (h, w) uint8 — JFIF Y IS the luma, so the
  grayscale pipeline needs no chroma upsample/color convert; chroma blocks
  are still entropy-decoded (the bitstream is sequential) but skip IDCT.

encode (``encode_jpeg``): grayscale or YCbCr (4:4:4 / 4:2:0) baseline
encoder with the spec's Annex-K quantization (quality-scaled, IJG rule)
and Annex-K Huffman tables — produces REAL files any viewer opens, and
gives the decoder round-trip tests an in-repo counterpart.

Out of subset (raise NotImplementedError, never misdecode): progressive
(SOF2), arithmetic coding, 12-bit precision, 16-bit quant tables,
sampling factors > 2.

Per-payload codec work is inherently serial; the Spark parallelism axis is
payloads per Arrow batch (see ``multimodal.image_features``).
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Figure A.6 zig-zag order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order
# via ZIGZAG applied at use time; stored here in zig-zag order as printed)
K1_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)  # natural (row-major) order per the spec's table

K2_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8×8 DCT-II basis matrix: row u, col x → c(u)/2 · cos((2x+1)uπ/16).
# forward: F = C @ f @ C.T ; inverse: f = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _HuffDecoder:
    """Canonical Huffman decoder (spec F.2.2.3 mincode/maxcode/valptr)."""

    def __init__(self, bits: list[int], values: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = list(values)
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the de-stuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: np.ndarray):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec: pad with 1s/0s at segment end; 0 is safe here
        b = (int(self.data[self.pos]) >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, s: int) -> int:
    """Spec F.12: map the s magnitude bits to a signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_symbol(r: _BitReader, h: _HuffDecoder) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        if h.maxcode[length] >= code:
            return h.values[h.valptr[length] + code - h.mincode[length]]
    raise ValueError("corrupt JPEG: huffman code longer than 16 bits")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JPEG → (h, w) uint8 LUMA plane."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    restart_interval = 0
    scan = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz  # de-zigzag into natural order
                qt[tq] = nat
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise NotImplementedError("sampling factors > 2 unsupported")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) unsupported"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(body[p + 17 : p + 17 + nvals])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos += seglen
            break  # entropy-coded data follows
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")

    # entropy segment: up to EOI, byte-stuffing (FF00→FF) removed, restart
    # markers located (positions in the DE-STUFFED stream)
    raw = np.frombuffer(data, dtype=np.uint8)[pos:]
    ff = raw == 0xFF
    nxt = np.zeros_like(ff)
    nxt[:-1] = ff[:-1]
    stuffed = np.zeros(len(raw), dtype=bool)
    stuffed[1:] = ff[:-1] & (raw[1:] == 0x00)
    # cut at EOI / any non-RST marker
    marker_at = np.flatnonzero(ff[:-1] & (raw[1:] != 0x00) & ~((raw[1:] >= 0xD0) & (raw[1:] <= 0xD7)))
    end = int(marker_at[0]) if len(marker_at) else len(raw)
    seg = raw[:end]
    stuffed = stuffed[:end]
    rst_mask = np.zeros(len(seg), dtype=bool)
    rst_mask[:-1] = (seg[:-1] == 0xFF) & (seg[1:] >= 0xD0) & (seg[1:] <= 0xD7)
    drop = stuffed.copy()
    rst_pos = np.flatnonzero(rst_mask)
    for rp in rst_pos:
        drop[rp] = True
        drop[rp + 1] = True
    kept = seg[~drop]
    # restart positions in the kept stream
    keep_cum = np.cumsum(~drop)
    rst_kept = sorted(int(keep_cum[rp]) for rp in rst_pos)

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # output planes (only luma is inverse-transformed; see module doc)
    luma_id = comps[0][0]
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        if cid == luma_id else None
        for cid, hs, vs, _ in comps
    }
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}

    r = _BitReader(kept)
    pred = {cid: 0 for cid, *_ in comps}
    rst_iter = iter(rst_kept)
    next_rst = next(rst_iter, None)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # resync: align to byte, skip to the recorded restart point
                r.align()
                if next_rst is not None:
                    r.pos, r.bit = next_rst, 0
                    next_rst = next(rst_iter, None)
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                hs, vs, tq = by_id[cid]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        # DC
                        s = _decode_symbol(r, huff_dc[td])
                        diff = _extend(r.read_bits(s), s) if s else 0
                        pred[cid] += diff
                        coeffs = np.zeros(64, dtype=np.int64)
                        coeffs[0] = pred[cid]
                        kpos = 1
                        while kpos < 64:
                            rs = _decode_symbol(r, huff_ac[ta])
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    kpos += 16
                                    continue
                                break  # EOB
                            kpos += rr
                            if kpos > 63:
                                raise ValueError("corrupt JPEG: AC index overflow")
                            coeffs[kpos] = _extend(r.read_bits(ss), ss)
                            kpos += 1
                        plane = planes[cid]
                        if plane is None:
                            continue  # chroma: bitstream advanced, IDCT skipped
                        nat = np.zeros(64, dtype=np.float64)
                        nat[ZIGZAG] = coeffs
                        blk = (nat * q.astype(np.float64)).reshape(8, 8)
                        px = _C.T @ blk @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    out = planes[luma_id]
    return np.clip(out[:h, :w] + 0.5, 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (tests' round-trip counterpart; real files)
# --------------------------------------------------------------------------


class _HuffEncoder:
    def __init__(self, bits: list[int], values: list[int]):
        self.codes: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def marker(self, m: int) -> None:
        """Byte-align and emit a raw (unstuffed) marker — RSTn."""
        self.flush()
        self.out += bytes([0xFF, m])


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = tables as-is, 1 worst, 100 lossless-ish."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (q * scale + 50) // 100
    return np.clip(out, 1, 255)


def _encode_block(
    bw: _BitWriter, block: np.ndarray, q: np.ndarray,
    dc: _HuffEncoder, ac: _HuffEncoder, pred: int,
) -> int:
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    coeffs = np.round(f.flatten() / q.astype(np.float64)).astype(np.int64)
    zz = coeffs[ZIGZAG]
    diff = int(zz[0]) - pred
    mag, s = abs(diff), 0
    while mag:
        mag >>= 1
        s += 1
    code, length = dc.codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for kpos in range(1, 64):
        v = int(zz[kpos])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zl = ac.codes[0xF0]
            bw.write(zrl, zl)
            run -= 16
        mag, ss = abs(v), 0
        while mag:
            mag >>= 1
            ss += 1
        code, length = ac.codes[(run << 4) | ss]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << ss) - 1, ss)
        run = 0
    if run:
        eob, el = ac.codes[0x00]
        bw.write(eob, el)
    return int(zz[0])


def _dht_segment(tc: int, th: int, table: tuple) -> bytes:
    bits, vals = table
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, q_nat: np.ndarray) -> bytes:
    zz = q_nat[ZIGZAG]  # natural → zig-zag order for the stream
    body = bytes([tq]) + bytes(int(v) for v in zz)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB → baseline JPEG bytes.
    ``subsample=True`` encodes color as 4:2:0 (2×2-mean chroma), else
    4:4:4. Grayscale encodes a single-component scan.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (exercises the decoder's resync path)."""
    px = np.asarray(pixels)
    color = px.ndim == 3
    h, w = px.shape[:2]
    ql = _quality_scale(K1_LUMA_Q, quality)
    qc = _quality_scale(K2_CHROMA_Q, quality)
    dcl, acl = _HuffEncoder(*K3_DC_LUMA), _HuffEncoder(*K3_AC_LUMA)
    dcc, acc = _HuffEncoder(*K3_DC_CHROMA), _HuffEncoder(*K3_AC_CHROMA)

    if color:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if subsample:
            comps = [(1, y, 2, 2, 0), (2, cb, 1, 1, 1), (3, cr, 1, 1, 1)]
        else:
            comps = [(1, y, 1, 1, 0), (2, cb, 1, 1, 1), (3, cr, 1, 1, 1)]
    else:
        comps = [(1, px.astype(np.float64), 1, 1, 0)]

    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes: dict[int, np.ndarray] = {}
    for cid, plane, hs, vs, _tq in comps:
        if color and subsample and hs == 1 and vs == 1 and (hmax, vmax) == (2, 2):
            # 4:2:0 chroma: 2×2 mean over an even-padded plane
            ph = (h + 1) & ~1
            pw = (w + 1) & ~1
            pad = np.empty((ph, pw))
            pad[:h, :w] = plane
            pad[h:, :w] = plane[h - 1 :, :]
            pad[:, w:] = pad[:, w - 1 : w]
            plane = (
                pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
        th = mcuy * vs * 8
        tw = mcux * hs * 8
        full = np.empty((th, tw))
        ch, cw = plane.shape
        full[:ch, :cw] = plane
        full[ch:, :cw] = plane[ch - 1 :, :]  # edge replicate
        full[:, cw:] = full[:, cw - 1 : cw]
        planes[cid] = full

    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.marker(0xD0 + (rst & 7))
                rst += 1
                pred = {cid: 0 for cid in pred}
            mcu_count += 1
            for cid, _plane, hs, vs, tq in comps:
                q = ql if tq == 0 else qc
                dc = dcl if tq == 0 else dcc
                ac = acl if tq == 0 else acc
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = planes[cid][y0 : y0 + 8, x0 : x0 + 8]
                        pred[cid] = _encode_block(bw, blk, q, dc, ac, pred[cid])
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, ql)
    if color:
        out += _dqt_segment(1, qc)
    # SOF0
    nc = len(comps)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for cid, _plane, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, K3_DC_LUMA) + _dht_segment(1, 0, K3_AC_LUMA)
    if color:
        out += _dht_segment(0, 1, K3_DC_CHROMA) + _dht_segment(1, 1, K3_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for cid, _plane, _hs, _vs, tq in comps:
        sos += bytes([cid, (0 << 4 | 0) if tq == 0 else (1 << 4 | 1)])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
