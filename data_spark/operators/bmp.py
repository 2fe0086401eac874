"""Vendored pure-stdlib BMP decoder — the uncompressed-DIB image member
of the multimodal strict tier (same pixel layout the AVI codec's BI_RGB
frames use: bottom-up rows, 4-byte stride padding, BGR order; BMP adds
the file header, palette-indexed 8-bit images, and top-down negative
heights).

Scope: BITMAPINFOHEADER (or larger V4/V5 headers, which extend it
compatibly), BI_RGB 24/32-bit truecolor and 8-bit palette. RLE and
bitfield compression raise the honest ValueError, same contract as
operators/avi.py for non-BI_RGB codecs.
"""

from __future__ import annotations

import struct


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def decode_rgb(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, packed top-down RGB) — the shared strict-decode
    return contract (png/gif.decode_rgb)."""
    if not is_bmp(data):
        raise ValueError("not a BMP payload")
    try:
        return _decode(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or corrupt BMP: {e}") from e


def _decode(data: bytes) -> tuple[int, int, bytes]:
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported (need BITMAPINFOHEADER+)")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise ValueError(f"BMP compression {compression} unsupported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP bit depth {bpp} unsupported (8/24/32 only)")
    if w <= 0 or h_raw == 0:
        raise ValueError(f"BMP dimensions {w}x{h_raw} invalid")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw

    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        palette = [
            tuple(data[pal_off + 4 * i : pal_off + 4 * i + 3][::-1])  # BGRX → RGB
            for i in range(n_colors)
        ]

    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    if len(data) < pixel_off + stride * h:
        raise ValueError(f"BMP pixel data truncated: {len(data)} bytes")
    rgb = bytearray(3 * w * h)
    for y in range(h):
        src_row = y if top_down else h - 1 - y
        src = pixel_off + src_row * stride
        dst = 3 * y * w
        if bpp == 8:
            for x in range(w):
                ci = data[src + x]
                if ci >= len(palette):
                    raise ValueError(f"palette index {ci} out of range")
                rgb[dst + 3 * x : dst + 3 * x + 3] = bytes(palette[ci])
        else:
            for x in range(w):
                b, g, r = data[src + bytes_pp * x : src + bytes_pp * x + 3]
                rgb[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return w, h, bytes(rgb)


def encode_rgb(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bit BI_RGB writer (bottom-up) for fixtures and
    round-trips."""
    stride = (width * 3 + 3) & ~3
    rows = bytearray()
    for y in range(height - 1, -1, -1):
        row = bytearray(stride)
        for x in range(width):
            r, g, b = rgb[3 * (y * width + x) : 3 * (y * width + x) + 3]
            row[3 * x : 3 * x + 3] = bytes((b, g, r))
        rows += row
    pixel_off = 14 + 40
    size = pixel_off + len(rows)
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    out += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    out += rows
    return bytes(out)
