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


def test_progressive_and_garbage_reject_honestly():
    img = test_image(16, 16)
    data, _ = encode_jpeg(img)
    # flip SOF0 -> SOF2 (progressive): honest NotImplementedError
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_rgb(prog)
    with pytest.raises(ValueError):
        decode_rgb(b"\x00\x01\x02\x03")
    # truncation inside the entropy stream
    with pytest.raises((ValueError, IndexError)):
        decode_rgb(data[: len(data) // 2])


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
