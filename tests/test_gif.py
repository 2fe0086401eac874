"""Vendored GIF decoder (operators/gif.py): real variable-width LZW
(dictionary growth, width bumps, the KwKwK corner, CLEAR resets),
interlace reordering, palette handling — plus the multimodal strict
path running real GIF bytes without Pillow. The test suite carries its
OWN spec-faithful LZW encoder so growth paths are exercised by streams
the degenerate fixture encoder never emits."""

from __future__ import annotations

import struct

import pytest

from data_spark.operators import gif, png


def _pixels(w, h, ncolors=7):
    return bytes((x * 3 + y * 5) % ncolors for y in range(h) for x in range(w))


def _real_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Spec LZW encoder (greedy longest-match, growing dictionary,
    width bumps at 2^width, freeze at 4096) — the stream shape real
    encoders emit."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    cur = b""
    for b in indices:
        ext = cur + bytes([b])
        if ext in table:
            cur = ext
            continue
        put(table[cur])
        if next_code < 4096:
            table[ext] = next_code
            next_code += 1
            # the decoder's dictionary lags the encoder's by ONE entry
            # (it builds entry k while reading code k+1), so the
            # encoder bumps one insertion after the decoder's canonical
            # next_code == 2^width rule: at encoder next_code == 2^width + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = bytes([b])
    put(table[cur])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(w, h, indices, palette, interlace=False, min_code_size=None):
    """Assemble a GIF89a around a REAL LZW stream."""
    depth = max(2, (len(palette) - 1).bit_length())
    size = 1 << depth
    mcs = min_code_size or depth
    table = b"".join(bytes(c) for c in palette) + b"\x00" * (3 * (size - len(palette)))
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        stream_rows = b"".join(indices[r * w : (r + 1) * w] for r in order)
    else:
        stream_rows = indices
    lzw = _real_lzw_encode(mcs, stream_rows)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table
    # a graphic-control extension, to exercise extension skipping
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


PALETTE = [(i * 31 % 256, i * 57 % 256, i * 89 % 256) for i in range(7)]


def _rgb(indices):
    return b"".join(bytes(PALETTE[i]) for i in indices)


def test_simple_encoder_roundtrip():
    idx = _pixels(9, 5)
    payload = gif.encode_rgb_simple(9, 5, _rgb(idx))
    assert gif.is_gif(payload)
    assert gif.decode_rgb(payload) == (9, 5, _rgb(idx))


def test_real_lzw_stream_with_dictionary_growth():
    # 64x32 = 2048 pixels: plenty of phrases -> dictionary growth and
    # at least one code-width bump
    idx = _pixels(64, 32)
    payload = _make_gif(64, 32, idx, PALETTE)
    assert gif.decode_rgb(payload) == (64, 32, _rgb(idx))


def test_kwkwk_corner_on_solid_run():
    # a long single-color run hits code==next_code (KwKwK) immediately
    idx = bytes([3]) * 400
    payload = _make_gif(20, 20, idx, PALETTE)
    assert gif.decode_rgb(payload) == (20, 20, _rgb(idx))


def test_interlaced_rows_reordered():
    idx = _pixels(11, 13)
    plain = _make_gif(11, 13, idx, PALETTE, interlace=False)
    laced = _make_gif(11, 13, idx, PALETTE, interlace=True)
    assert gif.decode_rgb(laced) == gif.decode_rgb(plain) == (11, 13, _rgb(idx))


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        gif.decode_rgb(b"NOTAGIF" + b"\x00" * 32)
    idx = _pixels(16, 16)
    payload = _make_gif(16, 16, idx, PALETTE)
    with pytest.raises(ValueError):
        # chop the LZW payload: the pixel budget can't be met
        gif.decode_rgb(payload[: len(payload) // 2] + b"\x00\x3b")


def test_strict_decode_runs_real_gif_without_pillow(spark):
    """Strict mode decodes real GIF bytes in THIS container (no
    Pillow) through the Arrow-batched mapInPandas plumbing, and the
    resize path re-encodes to the pipeline's normalized PNG output."""
    from data_spark.operators.multimodal import (
        extract_features,
        resize_images,
        wrap_binary,
    )

    solid = bytes([200, 10, 30]) * 36
    payload = gif.encode_rgb_simple(6, 6, solid)
    docs = spark.createDataFrame(
        [(1, payload, "src0")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="image/gif")

    feats = extract_features(media, decode_mode="strict").collect()
    assert len(feats) == 1 and len(feats[0]["features"]) == 16
    assert feats[0]["features"][0] == pytest.approx(200 / 255.0)
    assert feats[0]["features"][1] == pytest.approx(10 / 255.0)

    resized = resize_images(media, 3, 2, decode_mode="strict").collect()
    out = bytes(resized[0]["payload"])
    assert png.is_png(out)
    assert png.decode_rgb(out) == (3, 2, bytes([200, 10, 30]) * 6)
