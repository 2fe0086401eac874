"""Vendored baseline JPEG decoder — the transform-codec member of the
multimodal strict tier (PNG = filtered scanlines, GIF = variable-width
LZW entropy coding, BMP = raw DIBs, WAV/AVI = raw samples; JPEG adds a
REAL transform codec: Huffman entropy decoding → dequantization →
inverse DCT → chroma upsampling → YCbCr→RGB).

Scope is the quality-filter decode path's needs (operators/multimodal):
baseline sequential DCT (SOF0), 8-bit precision, grayscale or YCbCr
with sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:2:0), restart
markers, 8- and 16-bit quantization tables. Progressive (SOF2),
arithmetic coding, and 12-bit precision reject with an honest
NotImplementedError — never a wrong image.

The IDCT is the exact float DCT-III (numpy matrix form); entropy
decoding is bit-exact, so a decode recovers precisely the quantized
coefficients the encoder wrote — pinned in tests/test_jpeg.py by
comparing against the reference encoder's own reconstruction.

Reference parity: the reference pipelines treat media as opaque URLs
(twitter_*/news_* store attachment links); decoding is the
training-data extension, same tier as operators/png.py and gif.py.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i in the entropy stream -> (row, col)
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# exact float DCT-III basis: spatial = C.T @ coeffs @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


class _Huff:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; RSTn markers are surfaced to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def _byte(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                return b  # stuffed literal 0xFF; skip handled in advance
            raise _MarkerHit(nxt)
        return b

    def read_bit(self) -> int:
        b = self._byte()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_marker(self) -> None:
        """Skip to just after a marker (RSTn) and re-align."""
        self.bit = 0
        # self.pos points at the 0xFF of the marker
        self.pos += 2

    def decode_huff(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_rgb(data: bytes) -> tuple[int, int, bytes]:
    """Decode baseline JPEG bytes to (width, height, interleaved RGB).

    Raises ``NotImplementedError`` for progressive/arithmetic/12-bit
    streams and ``ValueError`` for corrupt ones."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (W, H, comps) with comps = [(cid, h, v, tq)]
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    vals = list(seg[off : off + 64])
                    off += 64
                else:
                    vals = list(
                        struct.unpack(">64H", seg[off : off + 128])
                    )
                    off += 128
                tbl = np.zeros(64)
                for i, z in enumerate(_ZIGZAG):
                    tbl[z] = vals[i]
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = seg[off + 17 : off + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            h_, w_ = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h_i, v_i = hv >> 4, hv & 0xF
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {h_i}x{v_i} (only 1 and 2 supported)"
                    )
                comps.append((cid, h_i, v_i, tq))
            frame = (w_, h_, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (only baseline SOF0 supported)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cid, tda = seg[1 + 2 * i : 3 + 2 * i]
                scan[cid] = (tda >> 4, tda & 0xF)
            return _decode_scan(
                data,
                pos + 2 + seg_len,
                frame,
                scan,
                qt,
                huff_dc,
                huff_ac,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w_, h_, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_ // (8 * hmax))
    mcuy = -(-h_ // (8 * vmax))
    planes = {}
    for cid, h_i, v_i, _tq in comps:
        planes[cid] = np.zeros((mcuy * v_i * 8, mcux * h_i * 8))
    pred = {cid: 0 for cid, *_ in comps}
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and consume the RSTn marker
                try:
                    while True:
                        reader.read_bit()
                except _MarkerHit as m:
                    if not (0xD0 <= m.marker <= 0xD7):
                        raise ValueError("expected restart marker") from None
                    reader.align_past_marker()
                    pred = {cid: 0 for cid in pred}
            for cid, h_i, v_i, tq in comps:
                td, ta = scan[cid]
                for by in range(v_i):
                    for bx in range(h_i):
                        block = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], pred, cid
                        )
                        spatial = _C.T @ (block * qt[tq]) @ _C + 128.0
                        y0 = (my * v_i + by) * 8
                        x0 = (mx * h_i + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    # upsample to full resolution by replication, crop, color-convert
    full = {}
    for cid, h_i, v_i, _tq in comps:
        p = planes[cid]
        if h_i < hmax:
            p = np.repeat(p, hmax // h_i, axis=1)
        if v_i < vmax:
            p = np.repeat(p, vmax // v_i, axis=0)
        full[cid] = p[:h_, :w_]
    if len(comps) == 1:
        g = np.clip(np.rint(full[comps[0][0]]), 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
    else:
        y = full[comps[0][0]]
        cb = full[comps[1][0]] - 128.0
        cr = full[comps[2][0]] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack(
            [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
            axis=-1,
        )
    return w_, h_, rgb.tobytes()


def _decode_block(reader, dc_tbl, ac_tbl, pred, cid) -> np.ndarray:
    coeffs = np.zeros(64)
    t = reader.decode_huff(dc_tbl)
    diff = _extend(reader.read_bits(t), t)
    pred[cid] += diff
    coeffs[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode_huff(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[_ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    return coeffs.reshape(8, 8)
