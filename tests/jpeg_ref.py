"""Reference baseline-JPEG ENCODER for the test suite (the spec-side
twin of operators/jpeg.py, like tests' spec LZW encoder for GIF): RGB →
YCbCr → optional 4:2:0 subsample → forward DCT → quantization → DC
diff + AC run-length → canonical Huffman → stuffed bitstream with the
full marker structure (SOI/DQT/SOF0/DHT/[DRI]/SOS/EOI).

``encode_jpeg`` also returns the encoder's OWN reconstruction — the
dequantized-IDCT image a correct decoder must produce. Decoder and
reconstruction share the identical numpy float expressions, so the
round trip is EXACT, not approximate: any mismatch is an entropy- or
indexing-level decoder bug, never float noise.
"""

from __future__ import annotations

import struct

import numpy as np

from data_spark.operators.jpeg import _C, _ZIGZAG

# ITU-T T.81 Annex K example quantization tables (natural row-major order)
QT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=float)
QT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=float)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits

    def marker(self, m: int) -> None:
        self.align()
        self.out += bytes([0xFF, m])


def _canonical_table(symbols: list[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """All used symbols at one code length L (smallest L with
    count < 2^L, so the all-ones code stays unused as JPEG requires).
    Returns (bits[16], vals, symbol -> (code, length))."""
    syms = sorted(set(symbols))
    ln = 1
    while (1 << ln) - 1 < len(syms):
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = len(syms)
    enc = {s: (i, ln) for i, s in enumerate(syms)}
    return bits, syms, enc


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit value) for a DC diff / AC coefficient."""
    t = int(abs(v)).bit_length()
    if t == 0:
        return 0, 0
    return t, v if v > 0 else v + (1 << t) - 1


def _block_symbols(q: np.ndarray, pred: int) -> tuple[list, int]:
    """(entropy events, new DC predictor) for one quantized block.
    Events: ('dc', t, bitsval) then ('ac', rs, t, bitsval)."""
    flat = q.reshape(64)
    dc = int(flat[0])
    t, bv = _magnitude(dc - pred)
    events = [("dc", t, bv)]
    zz = [int(flat[z]) for z in _ZIGZAG]
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            events.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        t, bv = _magnitude(zz[k])
        events.append(("ac", (run << 4) | t, t, bv))
        run = 0
    if last_nz < 63:
        events.append(("ac", 0x00, 0, 0))  # EOB
    return events, dc


def encode_jpeg(
    rgb: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    mode_422: bool = False,
) -> tuple[bytes, np.ndarray]:
    """Encode an (H, W, 3) uint8 array as baseline JPEG. Returns
    (jpeg_bytes, expected_rgb) where expected_rgb is the encoder's own
    dequantize→IDCT→upsample→color-convert reconstruction."""
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(float)
    g = rgb[..., 1].astype(float)
    b = rgb[..., 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    if mode_422:
        sampling = {1: (2, 1), 2: (1, 1), 3: (1, 1)}  # horizontal-only chroma
    elif subsample:
        sampling = {1: (2, 2), 2: (1, 1), 3: (1, 1)}
    else:
        sampling = {1: (1, 1), 2: (1, 1), 3: (1, 1)}
    hmax = max(s[0] for s in sampling.values())
    vmax = max(s[1] for s in sampling.values())
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    planes = {}
    for cid, plane in ((1, y), (2, cb), (3, cr)):
        h_i, v_i = sampling[cid]
        if (h_i, v_i) != (hmax, vmax):
            fh = vmax // v_i
            fw = hmax // h_i
            ph = -(-plane.shape[0] // fh) * fh
            pw = -(-plane.shape[1] // fw) * fw
            p = pad_to(plane, ph, pw)
            p = p.reshape(p.shape[0] // fh, fh, p.shape[1] // fw, fw).mean(axis=(1, 3))
        else:
            p = plane
        planes[cid] = pad_to(p, mcuy * v_i * 8, mcux * h_i * 8)

    qts = {1: QT_LUM, 2: QT_CHROM, 3: QT_CHROM}
    # forward DCT + quantize every block, remember them in MCU order
    mcu_blocks: list[tuple[int, np.ndarray]] = []  # (cid, quantized 8x8)
    recon_planes = {cid: np.zeros_like(planes[cid]) for cid in planes}
    preds = {1: 0, 2: 0, 3: 0}
    all_events_by_mcu: list[list] = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_events = []
            for cid in (1, 2, 3):
                h_i, v_i = sampling[cid]
                for by in range(v_i):
                    for bx in range(h_i):
                        y0 = (my * v_i + by) * 8
                        x0 = (mx * h_i + bx) * 8
                        block = planes[cid][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coeff = _C @ block @ _C.T
                        q = np.rint(coeff / qts[cid]).astype(int)
                        events, dc = _block_symbols(q, preds[cid])
                        preds[cid] = dc
                        mcu_events.append((cid, events))
                        mcu_blocks.append((cid, q))
                        # decoder-identical reconstruction expression
                        recon_planes[cid][y0 : y0 + 8, x0 : x0 + 8] = (
                            _C.T @ (q.astype(float).reshape(8, 8) * qts[cid]) @ _C
                            + 128.0
                        )
            all_events_by_mcu.append(mcu_events)
            if restart_interval:
                # restart resets DC predictors at interval boundaries
                n_done = my * mcux + mx + 1
                if n_done % restart_interval == 0 and n_done < mcux * mcuy:
                    preds = {1: 0, 2: 0, 3: 0}

    # build Huffman tables from the actually-used symbols
    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    for mcu in all_events_by_mcu:
        for cid, events in mcu:
            cls = 0 if cid == 1 else 1
            for ev in events:
                if ev[0] == "dc":
                    dc_syms[cls].append(ev[1])
                else:
                    ac_syms[cls].append(ev[1])
    dc_tables = {c: _canonical_table(v or [0]) for c, v in dc_syms.items()}
    ac_tables = {c: _canonical_table(v or [0]) for c, v in ac_syms.items()}

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, payload: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    for tq, tbl in ((0, QT_LUM), (1, QT_CHROM)):
        flat = tbl.reshape(64)
        zz = bytes(int(flat[z]) for z in _ZIGZAG)
        segment(0xDB, bytes([tq]) + zz)
    sof = bytearray([8])
    sof += struct.pack(">HH", h, w)
    sof.append(3)
    for cid in (1, 2, 3):
        h_i, v_i = sampling[cid]
        sof += bytes([cid, (h_i << 4) | v_i, 0 if cid == 1 else 1])
    segment(0xC0, bytes(sof))
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for th, (bits, vals, _enc) in tables.items():
            segment(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([3])
    for cid in (1, 2, 3):
        cls = 0 if cid == 1 else 1
        sos += bytes([cid, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    segment(0xDA, bytes(sos))

    bw = _BitWriter()
    n_done = 0
    for mcu in all_events_by_mcu:
        if restart_interval and n_done and n_done % restart_interval == 0:
            bw.marker(0xD0 + ((n_done // restart_interval - 1) % 8))
        for cid, events in mcu:
            cls = 0 if cid == 1 else 1
            dc_enc = dc_tables[cls][2]
            ac_enc = ac_tables[cls][2]
            for ev in events:
                if ev[0] == "dc":
                    _tag, t, bv = ev
                    code, ln = dc_enc[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(bv, t)
                else:
                    _tag, rs, t, bv = ev
                    code, ln = ac_enc[rs]
                    bw.write(code, ln)
                    if t:
                        bw.write(bv, t)
        n_done += 1
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI

    # reconstruction a correct decoder must produce (same float exprs)
    full = {}
    for cid in (1, 2, 3):
        h_i, v_i = sampling[cid]
        p = recon_planes[cid]
        if h_i < hmax:
            p = np.repeat(p, hmax // h_i, axis=1)
        if v_i < vmax:
            p = np.repeat(p, vmax // v_i, axis=0)
        full[cid] = p[:h, :w]
    yv = full[1]
    cbv = full[2] - 128.0
    crv = full[3] - 128.0
    rr = yv + 1.402 * crv
    gg = yv - 0.344136 * cbv - 0.714136 * crv
    bb = yv + 1.772 * cbv
    expected = np.stack(
        [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (rr, gg, bb)],
        axis=-1,
    )
    return bytes(out), expected


def test_image(h: int = 40, w: int = 56) -> np.ndarray:
    """Deterministic test image: smooth gradients + hash-derived noise
    + hard edges (exercises DC drift, AC runs, and clipping)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx * 7 + yy * 13) * 2654435761 % 256).astype(np.uint8)
    b[h // 3 : 2 * h // 3, w // 3 : 2 * w // 3] = 255  # hard-edged patch
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# Progressive (SOF2) reference encoder — spectral selection + successive
# approximation per ITU-T T.81 Annex G, mirroring libjpeg's scan logic.
# ---------------------------------------------------------------------------


def _prepare_blocks(rgb: np.ndarray, subsample: bool):
    """Shared front half: color transform, optional 4:2:0 subsample,
    pad, forward DCT, quantize. Returns (sampling, mcux, mcuy,
    zigzag-ordered quantized blocks per component, expected_rgb) where
    expected_rgb is the decoder-identical reconstruction."""
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(float)
    g = rgb[..., 1].astype(float)
    b = rgb[..., 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        sampling = {1: (2, 2), 2: (1, 1), 3: (1, 1)}
    else:
        sampling = {1: (1, 1), 2: (1, 1), 3: (1, 1)}
    hmax = max(s[0] for s in sampling.values())
    vmax = max(s[1] for s in sampling.values())
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad_to(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    planes = {}
    for cid, plane in ((1, y), (2, cb), (3, cr)):
        h_i, v_i = sampling[cid]
        if (h_i, v_i) != (hmax, vmax):
            fh = vmax // v_i
            fw = hmax // h_i
            ph = -(-plane.shape[0] // fh) * fh
            pw = -(-plane.shape[1] // fw) * fw
            p = pad_to(plane, ph, pw)
            p = p.reshape(p.shape[0] // fh, fh, p.shape[1] // fw, fw).mean(axis=(1, 3))
        else:
            p = plane
        planes[cid] = pad_to(p, mcuy * v_i * 8, mcux * h_i * 8)

    qts = {1: QT_LUM, 2: QT_CHROM, 3: QT_CHROM}
    qblocks = {}
    recon_planes = {}
    for cid in (1, 2, 3):
        h_i, v_i = sampling[cid]
        nby, nbx = mcuy * v_i, mcux * h_i
        zz = np.zeros((nby, nbx, 64), dtype=int)
        recon = np.zeros_like(planes[cid])
        for by in range(nby):
            for bx in range(nbx):
                block = planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                q = np.rint((_C @ block @ _C.T) / qts[cid]).astype(int)
                flat = q.reshape(64)
                zz[by, bx] = [int(flat[z]) for z in _ZIGZAG]
                recon[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ (q.astype(float).reshape(8, 8) * qts[cid]) @ _C + 128.0
                )
        qblocks[cid] = zz
        recon_planes[cid] = recon

    full = {}
    for cid in (1, 2, 3):
        h_i, v_i = sampling[cid]
        p = recon_planes[cid]
        if h_i < hmax:
            p = np.repeat(p, hmax // h_i, axis=1)
        if v_i < vmax:
            p = np.repeat(p, vmax // v_i, axis=0)
        full[cid] = p[:h, :w]
    yv = full[1]
    cbv = full[2] - 128.0
    crv = full[3] - 128.0
    rr = yv + 1.402 * crv
    gg = yv - 0.344136 * cbv - 0.714136 * crv
    bb = yv + 1.772 * cbv
    expected = np.stack(
        [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (rr, gg, bb)],
        axis=-1,
    )
    return sampling, mcux, mcuy, qblocks, expected


def _comp_grid(w, h, sampling, cid):
    """Non-interleaved block grid (T.81 A.2.2): the component's OWN
    ceil dimensions, not the MCU-padded grid."""
    hmax = max(s[0] for s in sampling.values())
    vmax = max(s[1] for s in sampling.values())
    h_i, v_i = sampling[cid]
    cw = -(-w * h_i // hmax)
    ch = -(-h * v_i // vmax)
    return -(-ch // 8), -(-cw // 8)


def _flush_eobrun(events, state):
    n = state["eobrun"]
    if n:
        nbits = n.bit_length() - 1
        events.append(("huff", "ac", state["cls"], nbits << 4))
        if nbits:
            events.append(("raw", n - (1 << nbits), nbits))
        events.extend(("raw", bit, 1) for bit in state["be"])
        state["eobrun"] = 0
        state["be"] = []


def _dc_first_events(qblocks, sampling, mcux, mcuy, al):
    events = []
    pred = {1: 0, 2: 0, 3: 0}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid in (1, 2, 3):
                h_i, v_i = sampling[cid]
                for by in range(v_i):
                    for bx in range(h_i):
                        dc = int(qblocks[cid][my * v_i + by, mx * h_i + bx, 0]) >> al
                        t, bv = _magnitude(dc - pred[cid])
                        pred[cid] = dc
                        events.append(("huff", "dc", 0 if cid == 1 else 1, t))
                        if t:
                            events.append(("raw", bv, t))
    return events


def _dc_refine_events(qblocks, sampling, mcux, mcuy, al):
    events = []
    for my in range(mcuy):
        for mx in range(mcux):
            for cid in (1, 2, 3):
                h_i, v_i = sampling[cid]
                for by in range(v_i):
                    for bx in range(h_i):
                        dc = int(qblocks[cid][my * v_i + by, mx * h_i + bx, 0])
                        events.append(("raw", (dc >> al) & 1, 1))
    return events


def _ac_first_events(qblocks, sampling, w, h, cid, ss, se, al):
    events = []
    cls = 0 if cid == 1 else 1
    state = {"eobrun": 0, "be": [], "cls": cls}
    cbh, cbw = _comp_grid(w, h, sampling, cid)
    for by in range(cbh):
        for bx in range(cbw):
            zz = qblocks[cid][by, bx]
            vals = {}
            for k in range(ss, se + 1):
                c = int(zz[k])
                t = abs(c) >> al  # point transform truncates toward zero
                if t:
                    vals[k] = t if c > 0 else -t
            if not vals:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    _flush_eobrun(events, state)
                continue
            _flush_eobrun(events, state)
            last = max(vals)
            run = 0
            for k in range(ss, last + 1):
                v = vals.get(k)
                if v is None:
                    run += 1
                    continue
                while run > 15:
                    events.append(("huff", "ac", cls, 0xF0))
                    run -= 16
                t, bv = _magnitude(v)
                events.append(("huff", "ac", cls, (run << 4) | t))
                events.append(("raw", bv, t))
                run = 0
            if last < se:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    _flush_eobrun(events, state)
    _flush_eobrun(events, state)
    return events


def _ac_refine_events(qblocks, sampling, w, h, cid, ss, se, al):
    """libjpeg encode_mcu_AC_refine: newly-significant coefficients as
    run/1 symbols with a sign bit; correction bits for already-nonzero
    coefficients buffered and emitted after the next symbol (or with
    the EOB run they belong to)."""
    events = []
    cls = 0 if cid == 1 else 1
    state = {"eobrun": 0, "be": [], "cls": cls}
    cbh, cbw = _comp_grid(w, h, sampling, cid)
    for by in range(cbh):
        for bx in range(cbw):
            zz = qblocks[cid][by, bx]
            absv = {k: abs(int(zz[k])) >> al for k in range(ss, se + 1)}
            eob = max((k for k in absv if absv[k] == 1), default=ss - 1)
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                temp = absv[k]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    _flush_eobrun(events, state)
                    events.append(("huff", "ac", cls, 0xF0))
                    r -= 16
                    events.extend(("raw", bit, 1) for bit in br)
                    br = []
                if temp > 1:
                    br.append(temp & 1)
                    continue
                _flush_eobrun(events, state)
                events.append(("huff", "ac", cls, (r << 4) | 1))
                events.append(("raw", 1 if int(zz[k]) > 0 else 0, 1))
                events.extend(("raw", bit, 1) for bit in br)
                br = []
                r = 0
            if r > 0 or br:
                state["eobrun"] += 1
                state["be"].extend(br)
                if state["eobrun"] == 0x7FFF:
                    _flush_eobrun(events, state)
    _flush_eobrun(events, state)
    return events


def encode_jpeg_progressive(
    rgb: np.ndarray, subsample: bool = False
) -> tuple[bytes, np.ndarray]:
    """Encode an (H, W, 3) uint8 array as progressive JPEG with a
    10-scan script exercising every T.81 §G decode path: interleaved
    DC first + DC refinement, per-component AC spectral bands, and TWO
    AC successive-approximation refinement passes on Y. Returns
    (jpeg_bytes, expected_rgb) with the decoder-identical
    reconstruction."""
    h, w = rgb.shape[:2]
    sampling, mcux, mcuy, qblocks, expected = _prepare_blocks(rgb, subsample)

    # scan script: (kind, cids, Ss, Se, Ah, Al)
    script = [
        ("dc_first", (1, 2, 3), 0, 0, 0, 1),
        ("ac_first", (1,), 1, 5, 0, 2),
        ("ac_first", (2,), 1, 63, 0, 1),
        ("ac_first", (3,), 1, 63, 0, 1),
        ("ac_first", (1,), 6, 63, 0, 2),
        ("dc_refine", (1, 2, 3), 0, 0, 1, 0),
        ("ac_refine", (1,), 1, 63, 2, 1),
        ("ac_refine", (2,), 1, 63, 1, 0),
        ("ac_refine", (3,), 1, 63, 1, 0),
        ("ac_refine", (1,), 1, 63, 1, 0),
    ]

    out = bytearray(b"\xff\xd8")

    def segment(marker: int, payload: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    for tq, tbl in ((0, QT_LUM), (1, QT_CHROM)):
        flat = tbl.reshape(64)
        segment(0xDB, bytes([tq]) + bytes(int(flat[z]) for z in _ZIGZAG))
    sof = bytearray([8])
    sof += struct.pack(">HH", h, w)
    sof.append(3)
    for cid in (1, 2, 3):
        h_i, v_i = sampling[cid]
        sof += bytes([cid, (h_i << 4) | v_i, 0 if cid == 1 else 1])
    segment(0xC2, bytes(sof))  # SOF2 progressive

    for kind, cids, ss, se, ah, al in script:
        if kind == "dc_first":
            events = _dc_first_events(qblocks, sampling, mcux, mcuy, al)
        elif kind == "dc_refine":
            events = _dc_refine_events(qblocks, sampling, mcux, mcuy, al)
        elif kind == "ac_first":
            events = _ac_first_events(qblocks, sampling, w, h, cids[0], ss, se, al)
        else:
            events = _ac_refine_events(qblocks, sampling, w, h, cids[0], ss, se, al)

        # per-scan canonical Huffman tables from the used symbols
        used: dict[tuple[str, int], list[int]] = {}
        for ev in events:
            if ev[0] == "huff":
                used.setdefault((ev[1], ev[2]), []).append(ev[3])
        tables = {key: _canonical_table(syms) for key, syms in used.items()}
        for (tkind, th), (bits, vals, _enc) in sorted(tables.items()):
            tc = 0 if tkind == "dc" else 1
            segment(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

        sos = bytearray([len(cids)])
        for cid in cids:
            cls = 0 if cid == 1 else 1
            td = cls if ("dc", cls) in tables else 0
            ta = cls if ("ac", cls) in tables else 0
            sos += bytes([cid, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        segment(0xDA, bytes(sos))

        bw = _BitWriter()
        for ev in events:
            if ev[0] == "huff":
                code, ln = tables[(ev[1], ev[2])][2][ev[3]]
                bw.write(code, ln)
            else:
                _tag, value, nbits = ev
                if nbits:
                    bw.write(value, nbits)
        bw.align()
        out.extend(bw.out)

    out.extend(b"\xff\xd9")
    return bytes(out), expected
