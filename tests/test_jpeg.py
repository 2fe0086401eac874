"""Baseline JPEG decoder (operators/jpeg.py) vs the suite's reference
encoder (tests/jpeg_ref.py): the round trip is EXACT — decoder and
encoder-reconstruction share identical float expressions, so any pixel
mismatch is an entropy/indexing bug, never float noise."""

from __future__ import annotations

import numpy as np
import pytest

from data_spark.operators.jpeg import decode_rgb, is_jpeg
from tests.jpeg_ref import encode_jpeg, test_image

test_image.__test__ = False  # helper, not a test


def _decode_array(data: bytes) -> np.ndarray:
    w, h, rgb = decode_rgb(data)
    return np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)


def test_444_round_trip_is_exact():
    img = test_image(40, 56)
    data, expected = encode_jpeg(img, subsample=False)
    assert is_jpeg(data)
    got = _decode_array(data)
    assert got.shape == expected.shape
    assert np.array_equal(got, expected)
    # and the lossy result still resembles the source (sanity on the
    # encoder itself: mean abs error small on smooth content)
    assert float(np.mean(np.abs(got.astype(int) - img.astype(int)))) < 20


def test_420_subsampled_round_trip_is_exact():
    img = test_image(48, 64)
    data, expected = encode_jpeg(img, subsample=True)
    got = _decode_array(data)
    assert np.array_equal(got, expected)


def test_422_horizontal_subsample_round_trip_is_exact():
    img = test_image(40, 48)
    data, expected = encode_jpeg(img, mode_422=True)
    got = _decode_array(data)
    assert np.array_equal(got, expected)


def test_non_mcu_aligned_dimensions():
    # 35x43 with 4:2:0 -> MCU grid must pad and the decoder must crop
    img = test_image(35, 43)
    data, expected = encode_jpeg(img, subsample=True)
    got = _decode_array(data)
    assert got.shape == (35, 43, 3)
    assert np.array_equal(got, expected)


def test_restart_markers_round_trip():
    img = test_image(48, 64)
    data, expected = encode_jpeg(img, subsample=False, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI present
    got = _decode_array(data)
    assert np.array_equal(got, expected)


def test_unsupported_and_garbage_reject_honestly():
    img = test_image(16, 16)
    data, _ = encode_jpeg(img)
    # lossless SOF3: honest NotImplementedError
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_rgb(data.replace(b"\xff\xc0", b"\xff\xc3", 1))
    # a baseline stream relabeled SOF2 carries an illegal progressive
    # scan header (DC band with Se=63): structural ValueError, never a
    # silently-wrong image
    with pytest.raises(ValueError):
        decode_rgb(data.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        decode_rgb(b"\x00\x01\x02\x03")
    # truncation inside the entropy stream
    with pytest.raises((ValueError, IndexError)):
        decode_rgb(data[: len(data) // 2])


def test_four_component_cmyk_rejects_honestly():
    """Adobe CMYK/YCCK (4 components) must reject instead of decoding
    the first three planes as YCbCr and returning wrong RGB (ADVICE
    r7)."""
    img = test_image(16, 16)
    data, _ = encode_jpeg(img)
    # rewrite the SOF payload: 4 components (the stream's entropy data
    # no longer matches, but the reject happens at the header)
    at = data.index(b"\xff\xc0")
    seg_len = int.from_bytes(data[at + 2 : at + 4], "big")
    sof = bytearray(data[at + 4 : at + 2 + seg_len])
    sof[5] = 4
    sof += bytes([4, 0x11, 1])  # component 4, 1x1, chroma table
    patched = (
        data[:at]
        + b"\xff\xc0"
        + (len(sof) + 2).to_bytes(2, "big")
        + bytes(sof)
        + data[at + 2 + seg_len :]
    )
    with pytest.raises(NotImplementedError, match="component"):
        decode_rgb(patched)


def test_noninterleaved_multiscan_baseline_rejects_honestly():
    """A baseline SOS covering only SOME frame components (legal JPEG,
    not implemented here) must reject at the header instead of dying
    with a KeyError mid-entropy-decode (ADVICE r7)."""
    img = test_image(16, 16)
    data, _ = encode_jpeg(img)
    at = data.index(b"\xff\xda")
    seg_len = int.from_bytes(data[at + 2 : at + 4], "big")
    sos = bytearray(data[at + 4 : at + 2 + seg_len])
    # keep only the first (Y) component in the scan header
    patched_sos = bytes([1]) + bytes(sos[1:3]) + bytes(sos[-3:])
    patched = (
        data[:at]
        + b"\xff\xda"
        + (len(patched_sos) + 2).to_bytes(2, "big")
        + patched_sos
        + data[at + 2 + seg_len :]
    )
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_rgb(patched)


def test_progressive_round_trip_is_exact():
    """SOF2 with the full 10-scan script (interleaved DC first + DC
    refinement, spectral AC bands, two successive-approximation AC
    refinement passes on Y): decode must be bit-exact against the
    encoder's reconstruction."""
    from tests.jpeg_ref import encode_jpeg_progressive

    img = test_image(48, 64)
    data, expected = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in data  # SOF2 present
    got = _decode_array(data)
    assert np.array_equal(got, expected)
    assert float(np.mean(np.abs(got.astype(int) - img.astype(int)))) < 20


def test_progressive_420_non_mcu_aligned_round_trip():
    """4:2:0 progressive with non-MCU-aligned dimensions: the
    non-interleaved AC scans traverse each component's OWN ceil grid
    (T.81 A.2.2), which differs from the MCU-padded grid here — the
    indexing distinction baseline never exercises."""
    from tests.jpeg_ref import encode_jpeg_progressive

    for h, w in ((35, 43), (99, 17)):
        img = test_image(h, w)
        data, expected = encode_jpeg_progressive(img, subsample=True)
        got = _decode_array(data)
        assert got.shape == (h, w, 3)
        assert np.array_equal(got, expected)


def test_strict_multimodal_dispatch_takes_jpeg(spark):
    """The Arrow-batched strict decode path accepts JPEG payloads (no
    Pillow needed) and produces real per-image features."""
    from data_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        wrap_binary,
    )

    img = test_image(24, 32)
    data, expected = encode_jpeg(img)
    df = spark.createDataFrame([(1, bytearray(data))], "id long, payload binary")
    wrapped = wrap_binary(df, "payload", "id", "id", "image/jpeg")
    feats = extract_features(wrapped, decode_mode="strict").collect()
    assert len(feats) == 1
    row = feats[0]
    # features = first FEATURE_DIM REAL decoded RGB bytes / 255
    want = [b / 255.0 for b in expected.tobytes()[:FEATURE_DIM]]
    assert row["features"] == pytest.approx(want)


def test_progressive_zero_sos_raises_not_gray():
    """A SOF2 stream whose SOS segments were stripped must raise, not
    render the all-zero accumulators into a fabricated solid-gray
    image (the quality-filter contract is 'never a wrong image')."""
    from tests.jpeg_ref import encode_jpeg_progressive

    img = test_image(16, 16)
    data, _ = encode_jpeg_progressive(img)
    sos = data.find(b"\xff\xda")
    eoi = data.rfind(b"\xff\xd9")
    assert 0 < sos < eoi
    stripped = data[:sos] + data[eoi:]
    with pytest.raises(ValueError, match="no SOS segment"):
        decode_rgb(stripped)


def test_truncated_progressive_raises_valueerror():
    """Progressive entropy data cut mid-scan surfaces as ValueError
    (decode_rgb's documented contract), never a bare IndexError."""
    from tests.jpeg_ref import encode_jpeg_progressive

    img = test_image(32, 32)
    data, _ = encode_jpeg_progressive(img)
    sos = data.find(b"\xff\xda")
    for cut in (sos + 20, len(data) // 2, len(data) - 8):
        truncated = data[:cut]
        with pytest.raises((ValueError, NotImplementedError)):
            decode_rgb(truncated)


def test_missing_huffman_table_raises_valueerror():
    """A scan referencing an undeclared Huffman table id must raise
    ValueError (corrupt stream), not KeyError."""
    img = test_image(16, 16)
    data, _ = encode_jpeg(img)
    # DHT marker is 0xFFC4; drop every DHT segment so the SOS scan
    # references tables that were never declared.
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos] == 0xFF and pos + 1 < len(data) and data[pos + 1] == 0xC4:
            seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
            pos += 2 + seg_len
            continue
        out.append(data[pos])
        pos += 1
    with pytest.raises(ValueError):
        decode_rgb(bytes(out))
