"""Vendored BMP decoder (operators/bmp.py): truecolor and palette DIBs,
bottom-up and top-down rows, stride padding, honest rejection of
compressed/unsupported variants — plus the strict multimodal path on
real BMP bytes."""

from __future__ import annotations

import struct

import pytest

from data_spark.operators import bmp, png


def _raster(w, h):
    return bytes((x * 7 + y * 13 + c * 29) % 256 for y in range(h) for x in range(w) for c in range(3))


def test_roundtrip_24bit_with_stride_padding():
    # width 5 -> 15-byte rows padded to 16: the stride path is exercised
    rgb = _raster(5, 4)
    assert bmp.decode_rgb(bmp.encode_rgb(5, 4, rgb)) == (5, 4, rgb)


def test_top_down_negative_height():
    rgb = _raster(4, 3)
    payload = bytearray(bmp.encode_rgb(4, 3, rgb))
    # flip to top-down: negate height, reorder rows to top-down
    struct.pack_into("<i", payload, 22, -3)
    stride = (4 * 3 + 3) & ~3
    off = struct.unpack_from("<I", payload, 10)[0]
    rows = [bytes(payload[off + r * stride : off + (r + 1) * stride]) for r in range(3)]
    payload[off:] = b"".join(reversed(rows))
    assert bmp.decode_rgb(bytes(payload)) == (4, 3, rgb)


def test_8bit_palette():
    # hand-build a 3x2 8-bit BMP with a 4-color palette
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    idx = [0, 1, 2, 3, 0, 1]  # row-major top-down
    w, h = 3, 2
    stride = (w + 3) & ~3
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    pixel_off = 14 + 40 + len(pal)
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray(stride)
        row[:w] = bytes(idx[y * w : (y + 1) * w])
        rows += row
    out = b"BM" + struct.pack("<IHHI", pixel_off + len(rows), 0, 0, pixel_off)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows), 0, 0, len(palette), 0)
    out += pal + bytes(rows)
    want = b"".join(bytes(palette[i]) for i in idx)
    assert bmp.decode_rgb(out) == (w, h, want)


def test_rejects_unsupported():
    with pytest.raises(ValueError):
        bmp.decode_rgb(b"NOBMP" + b"\x00" * 60)
    payload = bytearray(bmp.encode_rgb(3, 3, _raster(3, 3)))
    struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        bmp.decode_rgb(bytes(payload))
    trunc = bmp.encode_rgb(8, 8, _raster(8, 8))[:80]
    with pytest.raises(ValueError):
        bmp.decode_rgb(trunc)


def test_strict_decode_runs_real_bmp_without_pillow(spark):
    from data_spark.operators.multimodal import (
        extract_features,
        resize_images,
        wrap_binary,
    )

    solid = bytes([200, 10, 30]) * 36
    payload = bmp.encode_rgb(6, 6, solid)
    docs = spark.createDataFrame(
        [(1, payload, "src0")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="image/bmp")

    feats = extract_features(media, decode_mode="strict").collect()
    assert len(feats) == 1 and len(feats[0]["features"]) == 16
    assert feats[0]["features"][0] == pytest.approx(200 / 255.0)

    resized = resize_images(media, 3, 2, decode_mode="strict").collect()
    out = bytes(resized[0]["payload"])
    assert png.is_png(out)
    assert png.decode_rgb(out) == (3, 2, bytes([200, 10, 30]) * 6)
