"""Vendored pure-stdlib GIF decoder — the compressed-codec member of
the multimodal strict tier (PNG = filtered scanlines, WAV = raw PCM,
AVI = raw DIB frames; GIF adds a REAL entropy decoder: variable-width
LZW with dictionary growth, clear codes, and deferred EOI).

Scope is the quality-filter decode path's needs (operators/multimodal):
GIF87a/GIF89a, global or local color table, the first image frame,
optional interlace, transparent-index-aware via the GCE. Animation
composition, disposal methods, and text/plain extensions are out of
scope — multi-frame files decode their FIRST frame, which is what a
thumbnail/feature pass samples anyway.

Reference parity: the reference pipelines treat media as opaque URLs
(e.g. twitter_*/news_* store attachment links); decoding is the
training-data extension, same tier as operators/png.py.
"""

from __future__ import annotations

import struct


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _color_table(data: bytes, off: int, n: int) -> tuple[list[tuple[int, int, int]], int]:
    table = []
    for i in range(n):
        r, g, b = data[off + 3 * i : off + 3 * i + 3]
        table.append((r, g, b))
    return table, off + 3 * n


def _lzw_decode(min_code_size: int, blocks: bytes, n_pixels: int) -> bytes:
    """Variable-width LZW (GIF flavor): codes start at min_code_size+1
    bits, the dictionary grows until 4096 entries (then freezes until a
    CLEAR), CLEAR resets to the initial alphabet, EOI ends the stream.
    Decodes at most ``n_pixels`` indices (some encoders pad)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader over the concatenated sub-block payload, LSB first
    bitpos = 0
    total_bits = len(blocks) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = blocks[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    def reset():
        d = {i: bytes([i]) for i in range(clear)}
        return d, min_code_size + 1, clear + 2

    table, width, next_code = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} before definition")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(f"LZW stream ended early: {len(out)} of {n_pixels} pixels")
    return bytes(out[:n_pixels])


def _deinterlace(idx: bytes, w: int, h: int) -> bytes:
    rows = [idx[r * w : (r + 1) * w] for r in range(h)]
    out: list[bytes | None] = [None] * h
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for r in range(start, h, step):
            out[r] = rows[src]
            src += 1
    return b"".join(out)  # type: ignore[arg-type]


def decode_rgb(data: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame to (width, height, packed RGB bytes) —
    the same return contract as png.decode_rgb, so the multimodal
    strict path treats both formats uniformly. Transparent pixels (via
    the 89a graphic-control extension) decode to their palette color;
    transparency is metadata for a feature pass, not compositing."""
    if not is_gif(data):
        raise ValueError("not a GIF payload")
    try:
        return _decode_first_frame(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt GIF: {e}") from e


def _decode_first_frame(data: bytes) -> tuple[int, int, bytes]:
    _w_screen, _h_screen, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _color_table(data, off, 2 << (packed & 0x07))
    while off < len(data):
        b0 = data[off]
        if b0 == 0x21:  # extension: label + sub-blocks, skip
            off += 2
            while data[off] != 0:
                off += 1 + data[off]
            off += 1
        elif b0 == 0x2C:  # image descriptor
            _x, _y, w, h, ipacked = struct.unpack_from("<HHHHB", data, off + 1)
            off += 10
            table = gct
            if ipacked & 0x80:
                table, off = _color_table(data, off, 2 << (ipacked & 0x07))
            if table is None:
                raise ValueError("GIF image without any color table")
            min_code_size = data[off]
            off += 1
            blocks = bytearray()
            while data[off] != 0:
                n = data[off]
                blocks += data[off + 1 : off + 1 + n]
                off += 1 + n
            off += 1
            idx = _lzw_decode(min_code_size, bytes(blocks), w * h)
            if ipacked & 0x40:
                idx = _deinterlace(idx, w, h)
            rgb = bytearray(3 * w * h)
            for i, ci in enumerate(idx):
                if ci >= len(table):
                    raise ValueError(f"palette index {ci} out of range")
                rgb[3 * i : 3 * i + 3] = bytes(table[ci])
            return w, h, bytes(rgb)
        elif b0 == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image frame")


# -- test-support encoder ---------------------------------------------------


def encode_rgb_simple(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal GIF89a encoder for fixtures/round-trips: builds a palette
    from the distinct colors (≤256 required), then emits a DEGENERATE
    but spec-valid LZW stream — a CLEAR before every pixel code, so the
    dictionary never grows and codes stay at the initial width. Real
    decoders (including ours) must handle it; it exercises the CLEAR
    path a compact encoder rarely hits."""
    pixels = [tuple(rgb[3 * i : 3 * i + 3]) for i in range(width * height)]
    palette = sorted(set(pixels))
    if len(palette) > 256:
        raise ValueError("simple encoder supports <=256 distinct colors")
    pindex = {c: i for i, c in enumerate(palette)}
    depth = max(2, (len(palette) - 1).bit_length())  # GIF min code size >= 2
    size = 1 << depth
    table = b"".join(bytes(c) for c in palette) + b"\x00" * (3 * (size - len(palette)))

    clear = size
    width_bits = depth + 1
    bits = bytearray()
    acc = 0
    nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for p in pixels:
        put(clear)
        put(pindex[p])
    put(clear + 1)  # EOI
    if nbits:
        bits.append(acc & 0xFF)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(depth)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
