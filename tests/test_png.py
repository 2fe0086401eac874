"""Vendored PNG codec (operators/png.py) + the multimodal strict path
running REAL image bytes without Pillow (VERDICT r3 'What's missing'
#3: the strict decode had never executed in this sandbox)."""

from __future__ import annotations

import struct
import zlib

import pytest

from data_spark.operators import png
from data_spark.operators.multimodal import extract_features, wrap_binary


def _pixels(w, h, nch):
    """Deterministic test raster: channel-striped gradient."""
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(nch)
    )


def _apply_filter(ftype, line, prev, nch):
    out = bytearray([ftype])
    for i, v in enumerate(line):
        left = line[i - nch] if i >= nch else 0
        up = prev[i]
        up_left = prev[i - nch] if i >= nch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = png._paeth(left, up, up_left)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def _build_png(w, h, color_type, raster, filters):
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * nch
    prev = bytes(stride)
    raw = bytearray()
    for y in range(h):
        line = raster[y * stride : (y + 1) * stride]
        raw += _apply_filter(filters[y % len(filters)], line, prev, nch)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        png.PNG_MAGIC
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png._chunk(b"IEND", b"")
    )


def test_roundtrip_rgb():
    rgb = _pixels(5, 4, 3)
    data = png.encode_rgb(5, 4, rgb)
    assert png.is_png(data)
    assert png.decode_rgb(data) == (5, 4, rgb)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_scanline_filter_unfilters(ftype):
    rgb = _pixels(7, 5, 3)
    data = _build_png(7, 5, 2, rgb, [ftype])
    assert png.decode_rgb(data) == (7, 5, rgb)


def test_mixed_filters_and_rgba_and_grey():
    rgb = _pixels(6, 6, 3)
    assert png.decode_rgb(_build_png(6, 6, 2, rgb, [0, 1, 2, 3, 4]))[2] == rgb
    rgba = _pixels(4, 3, 4)
    w, h, got = png.decode_rgb(_build_png(4, 3, 6, rgba, [4, 2]))
    expect = b"".join(rgba[4 * p : 4 * p + 3] for p in range(12))
    assert (w, h, got) == (4, 3, expect)
    grey = _pixels(3, 3, 1)
    _, _, got = png.decode_rgb(_build_png(3, 3, 0, grey, [1]))
    assert got == b"".join(bytes((v, v, v)) for v in grey)


def test_decode_rejects_out_of_scope():
    with pytest.raises(ValueError):
        png.decode_rgb(b"GIF89a not a png")
    bad_depth = png.PNG_MAGIC + png._chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    )
    with pytest.raises(ValueError):
        png.decode_rgb(bad_depth)


def test_resize_nearest_deterministic():
    rgb = _pixels(8, 8, 3)
    small = png.resize_rgb_nearest(8, 8, rgb, 4, 2)
    assert len(small) == 4 * 2 * 3
    assert small == png.resize_rgb_nearest(8, 8, rgb, 4, 2)
    # 1x1 picks the top-left pixel
    assert png.resize_rgb_nearest(8, 8, rgb, 1, 1) == rgb[:3]


def test_strict_decode_runs_real_png_without_pillow(spark):
    """The whole point of the vendored codec: strict mode decodes real
    image bytes in THIS container (no Pillow), through the actual
    Arrow-batched mapInPandas plumbing."""
    from data_spark.operators.multimodal import resize_images

    solid = bytes([200, 10, 30]) * 36
    payload = png.encode_rgb(6, 6, solid)
    docs = spark.createDataFrame(
        [(1, payload, "src0")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="image/png")

    feats = extract_features(media, decode_mode="strict").collect()
    assert len(feats) == 1 and len(feats[0]["features"]) == 16
    # decoded RGB of a solid-color image: first pixel bytes are the color
    assert feats[0]["features"][0] == pytest.approx(200 / 255.0)
    assert feats[0]["features"][1] == pytest.approx(10 / 255.0)

    resized = resize_images(media, 3, 2, decode_mode="strict").collect()
    out = bytes(resized[0]["payload"])
    assert png.is_png(out)
    assert png.decode_rgb(out) == (3, 2, bytes([200, 10, 30]) * 6)
