"""Vendored JPEG decoder — the transform-codec member of the
multimodal strict tier (PNG = filtered scanlines, GIF = variable-width
LZW entropy coding, BMP = raw DIBs, WAV/AVI = raw samples; JPEG adds a
REAL transform codec: Huffman entropy decoding → dequantization →
inverse DCT → chroma upsampling → YCbCr→RGB).

Scope is the quality-filter decode path's needs (operators/multimodal):
baseline sequential DCT (SOF0) AND progressive DCT (SOF2, spectral
selection + successive approximation — most real-web JPEGs are
progressive, VERDICT r7 #2), 8-bit precision, grayscale or YCbCr with
sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:2:0), restart
markers, 8- and 16-bit quantization tables. Arithmetic coding, 12-bit
precision, hierarchical/lossless SOFs, 4-component (Adobe CMYK/YCCK)
frames, and non-interleaved multi-scan BASELINE streams reject with an
honest NotImplementedError — never a wrong image (ADVICE r7).

The IDCT is the exact float DCT-III (numpy matrix form); entropy
decoding is bit-exact, so a decode recovers precisely the quantized
coefficients the encoder wrote — pinned in tests/test_jpeg.py by
comparing against the reference encoder's own reconstruction (baseline
AND a 10-scan progressive script with DC/AC refinement passes).

Progressive decoding follows ITU-T T.81 §G: each SOS contributes one
(spectral band, bit-precision) slice of the quantized coefficients —
DC-first scans decode predictor diffs shifted by Al, DC-refinement
scans read one correction bit per block, AC-first scans run-length
decode a band with EOB-run skipping, AC-refinement scans interleave
newly-significant coefficients with correction bits for the already-
significant ones. Coefficients accumulate per component across scans;
dequantization + IDCT run once at EOI over the same exact float path
as baseline.

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


def _parse_sof(seg: bytes) -> tuple[int, int, list]:
    prec = seg[0]
    if prec != 8:
        raise NotImplementedError(f"{prec}-bit JPEG precision")
    h_, w_ = struct.unpack(">HH", seg[1:5])
    ncomp = seg[5]
    if ncomp not in (1, 3):
        # 4-component = Adobe CMYK/YCCK: decoding the first three as
        # YCbCr would silently return a wrong image (ADVICE r7)
        raise NotImplementedError(
            f"{ncomp}-component JPEG (only grayscale and YCbCr supported)"
        )
    comps = []
    for i in range(ncomp):
        cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
        h_i, v_i = hv >> 4, hv & 0xF
        if h_i not in (1, 2) or v_i not in (1, 2):
            raise NotImplementedError(
                f"sampling factors {h_i}x{v_i} (only 1 and 2 supported)"
            )
        comps.append((cid, h_i, v_i, tq))
    return (w_, h_, comps)


def decode_rgb(data: bytes) -> tuple[int, int, bytes]:
    """Decode baseline (SOF0) or progressive (SOF2) JPEG bytes to
    (width, height, interleaved RGB).

    Raises ``NotImplementedError`` for arithmetic/12-bit/hierarchical/
    CMYK streams and ``ValueError`` for corrupt ones.  Truncated or
    internally inconsistent streams (entropy data running off the end,
    scans referencing undeclared Huffman/quant tables) surface as
    ``ValueError`` — never as bare ``IndexError``/``KeyError`` — so the
    quality-filter pipeline can treat every corrupt input uniformly."""
    try:
        return _decode_rgb(data)
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt JPEG stream: {exc!r}") from exc


def _decode_rgb(data: bytes) -> tuple[int, int, bytes]:
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (W, H, comps) with comps = [(cid, h, v, tq)]
    progressive = False
    coef: dict[int, np.ndarray] | None = None  # progressive accumulators
    scans_seen = 0  # SOS segments actually decoded (coef alone is not proof)
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
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended seq.
            frame = _parse_sof(seg)
        elif marker == 0xC2:  # SOF2 progressive
            frame = _parse_sof(seg)
            progressive = True
            coef = _alloc_coefficients(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (only SOF0/SOF1/SOF2 supported)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            scan_order = []
            for i in range(ns):
                cid, tda = seg[1 + 2 * i : 3 + 2 * i]
                scan[cid] = (tda >> 4, tda & 0xF)
                scan_order.append(cid)
            ss, se, ahl = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0xF
            if not progressive:
                if set(scan_order) != {c[0] for c in frame[2]}:
                    raise NotImplementedError(
                        "non-interleaved multi-scan baseline JPEG"
                    )
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
            scans_seen += 1
            pos = _decode_progressive_scan(
                data,
                pos + 2 + seg_len,
                frame,
                coef,
                scan_order,
                scan,
                (ss, se, ah, al),
                huff_dc,
                huff_ac,
                restart_interval,
            )
            continue
        pos += 2 + seg_len
    if progressive:
        if coef is None or scans_seen == 0:
            # A SOF2 with zero SOS segments would otherwise render the
            # all-zero accumulators into a fabricated solid-gray image.
            raise ValueError("no SOS segment found")
        return _render_progressive(frame, coef, qt)
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
    return _upsample_color(frame, planes)


def _upsample_color(frame, planes) -> tuple[int, int, bytes]:
    """Shared render tail: upsample to full resolution by replication,
    crop to the frame dimensions, color-convert (identical float
    expressions in the baseline and progressive paths — and in the test
    encoder's reconstruction, which is what makes round trips EXACT)."""
    w_, h_, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
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


# ---------------------------------------------------------------------------
# Progressive (SOF2) — ITU-T T.81 Annex G successive approximation
# ---------------------------------------------------------------------------


def _alloc_coefficients(frame) -> dict[int, np.ndarray]:
    """Per-component quantized-coefficient accumulators, shape
    (block_rows, block_cols, 64) in ZIGZAG-scan index space (scans
    address coefficients by scan position; natural order is restored at
    render time). The grid is MCU-padded like baseline's plane grid."""
    w_, h_, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_ // (8 * hmax))
    mcuy = -(-h_ // (8 * vmax))
    return {
        cid: np.zeros((mcuy * v_i, mcux * h_i, 64), dtype=np.int32)
        for cid, h_i, v_i, _tq in comps
    }


def _dc_first(reader, tbl, pred, cid, blk, al) -> None:
    t = reader.decode_huff(tbl)
    diff = _extend(reader.read_bits(t), t)
    pred[cid] += diff
    blk[0] = pred[cid] << al


def _dc_refine(reader, blk, al) -> None:
    if reader.read_bit():
        blk[0] |= 1 << al


def _ac_first(reader, tbl, blk, ss, se, al, state) -> None:
    """First AC scan of a band: baseline-style run-length decoding plus
    EOB runs (an EOBn symbol skips 2^n + extra whole blocks whose band
    is entirely zero at this precision)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_huff(tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past end of band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _refine_nonzero(reader, blk, k, p1, m1) -> None:
    """One correction bit for an already-nonzero coefficient: append
    the next lower magnitude bit when set (T.81 G.1.2.3)."""
    if reader.read_bit() and (int(blk[k]) & p1) == 0:
        blk[k] += p1 if blk[k] >= 0 else m1


def _ac_refine(reader, tbl, blk, ss, se, al, state) -> None:
    """Refinement AC scan: newly-significant coefficients arrive as
    run/size symbols with a sign bit; every already-nonzero coefficient
    passed over (including inside EOB runs) carries one correction
    bit, interleaved exactly as the encoder buffered them."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_huff(tbl)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                # ZRL: skip 16 zero-HISTORY coefficients (nonzero ones
                # passed over get correction bits, below)
            else:
                if s != 1:
                    raise ValueError("invalid magnitude in AC refinement scan")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(reader, blk, k, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0:
                _refine_nonzero(reader, blk, k, p1, m1)
            k += 1
        state["eobrun"] -= 1


def _decode_progressive_scan(
    data, pos, frame, coef, scan_order, scan, band, huff_dc, huff_ac, restart_interval
) -> int:
    """Decode ONE progressive SOS into the coefficient accumulators;
    returns the offset of the next marker after the scan's entropy
    data. ``band`` is (Ss, Se, Ah, Al)."""
    w_, h_, comps = frame
    ss, se, ah, al = band
    byc = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_ // (8 * hmax))
    mcuy = -(-h_ // (8 * vmax))
    if ss == 0 and se != 0:
        raise ValueError("DC progressive scan must have Se = 0")
    if ss > 0 and len(scan_order) != 1:
        raise ValueError("progressive AC scans must be non-interleaved")
    if ss > se or se > 63:
        raise ValueError(f"invalid spectral band {ss}..{se}")

    def units():
        if len(scan_order) > 1:
            # interleaved (DC scans): MCU order, all scan components
            for my in range(mcuy):
                for mx in range(mcux):
                    unit = []
                    for cid in scan_order:
                        _c, h_i, v_i, _tq = byc[cid]
                        for by in range(v_i):
                            for bx in range(h_i):
                                unit.append((cid, my * v_i + by, mx * h_i + bx))
                    yield unit
        else:
            # non-interleaved: the component's OWN ceil-grid, raster
            # order (T.81 A.2.2 — NOT the MCU-padded grid)
            cid = scan_order[0]
            _c, h_i, v_i, _tq = byc[cid]
            cbw = -(-(-(-w_ * h_i // hmax)) // 8)
            cbh = -(-(-(-h_ * v_i // vmax)) // 8)
            for by in range(cbh):
                for bx in range(cbw):
                    yield [(cid, by, bx)]

    reader = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = {cid: 0 for cid in scan_order}
    n = 0
    for unit in units():
        if restart_interval and n and n % restart_interval == 0:
            try:
                while True:
                    reader.read_bit()
            except _MarkerHit as m:
                if not (0xD0 <= m.marker <= 0xD7):
                    raise ValueError("expected restart marker") from None
                reader.align_past_marker()
                pred = {cid: 0 for cid in pred}
                state["eobrun"] = 0
        for cid, by, bx in unit:
            blk = coef[cid][by, bx]
            if ss == 0:
                if ah == 0:
                    _dc_first(reader, huff_dc[scan[cid][0]], pred, cid, blk, al)
                else:
                    _dc_refine(reader, blk, al)
            else:
                if ah == 0:
                    _ac_first(reader, huff_ac[scan[cid][1]], blk, ss, se, al, state)
                else:
                    _ac_refine(reader, huff_ac[scan[cid][1]], blk, ss, se, al, state)
        n += 1
    # the scan's entropy data ends at the next non-RST marker
    p = reader.pos
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] not in (0x00,):
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _render_progressive(frame, coef, qt) -> tuple[int, int, bytes]:
    """Dequantize + IDCT the accumulated coefficients — the SAME float
    expression as the baseline path (and the test encoder's
    reconstruction), block by block, then the shared upsample/color
    tail."""
    w_, h_, comps = frame
    planes = {}
    for cid, h_i, v_i, tq in comps:
        arr = coef[cid]
        nby, nbx, _ = arr.shape
        plane = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                nat = np.zeros(64)
                zz = arr[by, bx]
                for k, z in enumerate(_ZIGZAG):
                    nat[z] = zz[k]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ (nat.reshape(8, 8) * qt[tq]) @ _C + 128.0
                )
        planes[cid] = plane
    return _upsample_color(frame, planes)
