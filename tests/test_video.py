"""Vendored AVI codec (operators/avi.py) + the multimodal strict
frame-sampling path running REAL video bytes without ffmpeg (VERDICT
r4 'Next round' #7: video was the last multimodal stub; PNG and WAV
went real in r4)."""

from __future__ import annotations

import struct

import pytest

from data_spark.operators import avi
from data_spark.operators.multimodal import sample_frames, wrap_binary


def _frame(w, h, f):
    """Deterministic raster: per-frame-shifted channel-striped gradient."""
    return bytes(
        (x * 7 + y * 13 + f * 29 + c * 3) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def _clip(w=6, h=4, n=5, fps=25):
    frames = [_frame(w, h, f) for f in range(n)]
    return frames, avi.encode_avi(w, h, frames, fps=fps)


# ---------------------------------------------------------------- codec


def test_roundtrip_bit_exact():
    frames, payload = _clip()
    assert avi.is_avi(payload)
    w, h, dur_ms, decoded = avi.decode_frames(payload)
    assert (w, h, dur_ms) == (6, 4, 40.0)
    assert [(i, int(i * 40)) for i in range(5)] == [(i, ts) for i, ts, _ in decoded]
    assert [rgb for _, _, rgb in decoded] == frames


def test_odd_width_stride_padding():
    # 3px * 3B = 9B rows pad to a 12B DIB stride; decode must strip it
    frames, payload = _clip(w=3, h=2, n=2, fps=10)
    w, h, dur_ms, decoded = avi.decode_frames(payload)
    assert (w, h, dur_ms) == (3, 2, 100.0)
    assert [rgb for _, _, rgb in decoded] == frames


def test_not_avi_rejected():
    assert not avi.is_avi(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="RIFF"):
        avi.decode_frames(b"garbage bytes")


def test_missing_hdrl_rejected():
    with pytest.raises(ValueError, match="hdrl"):
        avi.decode_frames(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_compressed_codec_rejected():
    # flip biCompression in the strf chunk to an unsupported fourcc
    # ('H264'): the codec must refuse rather than misread the bytes
    _, payload = _clip()
    strf_at = payload.index(b"strf")
    mutated = bytearray(payload)
    # biCompression sits 16 bytes into the BITMAPINFOHEADER body
    # (after the 8-byte chunk header)
    struct.pack_into("<I", mutated, strf_at + 8 + 16, struct.unpack("<I", b"H264")[0])
    with pytest.raises(ValueError, match="biCompression"):
        avi.decode_frames(bytes(mutated))


# ------------------------------------------------------------ MJPEG


def _mjpeg_clip(n=3, w=24, h=16, fps=25):
    """n baseline-JPEG frames (distinct test images) wrapped as an
    MJPEG AVI; returns (expected_rgb_frames, avi_bytes)."""
    from tests.jpeg_ref import encode_jpeg, test_image

    jpegs, expected = [], []
    for i in range(n):
        img = test_image(h, w)
        # vary content per frame deterministically so frames differ
        img = ((img.astype(int) + 13 * i) % 256).astype(img.dtype)
        data, recon = encode_jpeg(img)
        jpegs.append(data)
        expected.append(recon.tobytes())
    return expected, avi.encode_avi_mjpeg(w, h, jpegs, fps=fps)


def test_mjpeg_roundtrip_bit_exact():
    """MJPEG frames decode bit-exactly against the JPEG path's own
    reconstruction (the decoder and the test encoder share identical
    float expressions)."""
    expected, payload = _mjpeg_clip(n=3, w=24, h=16, fps=25)
    w, h, dur_ms, decoded = avi.decode_frames(payload)
    assert (w, h) == (24, 16)
    assert dur_ms == 40.0
    assert [rgb for _, _, rgb in decoded] == expected
    assert [(i, ts) for i, ts, _ in decoded] == [(0, 0), (1, 40), (2, 80)]


def test_mjpeg_progressive_frames_decode():
    """'MJPG' chunks holding SOF2 progressive pictures ride the same
    path (the JPEG decoder handles both coding processes)."""
    from tests.jpeg_ref import encode_jpeg_progressive, test_image

    img = test_image(16, 16)
    data, recon = encode_jpeg_progressive(img)
    payload = avi.encode_avi_mjpeg(16, 16, [data], fps=10)
    w, h, dur_ms, decoded = avi.decode_frames(payload)
    assert (w, h, dur_ms) == (16, 16, 100.0)
    assert decoded[0][2] == recon.tobytes()


def test_mjpeg_dimension_mismatch_rejected():
    from tests.jpeg_ref import encode_jpeg, test_image

    data, _ = encode_jpeg(test_image(8, 8))
    payload = avi.encode_avi_mjpeg(16, 16, [data])  # header lies
    with pytest.raises(ValueError, match="does not match stream header"):
        avi.decode_frames(payload)


def test_mjpeg_corrupt_frame_rejected():
    from tests.jpeg_ref import encode_jpeg, test_image

    data, _ = encode_jpeg(test_image(16, 16))
    payload = avi.encode_avi_mjpeg(16, 16, [data[: len(data) // 2]])
    with pytest.raises(ValueError):
        avi.decode_frames(payload)


def test_mjpeg_strict_sample_frames(spark):
    """MJPEG AVIs flow through the strict Arrow mapInPandas sampling
    path exactly like BI_RGB ones."""
    expected, payload = _mjpeg_clip(n=5, w=24, h=16, fps=25)  # 200 ms clip
    docs = spark.createDataFrame(
        [(1, payload, "unit")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="video/avi")
    rows = sample_frames(media, frame_interval_ms=100, decode_mode="strict").collect()
    got = {r.frame_idx: (r.frame_ts_ms, bytes(r.frame)) for r in rows}
    assert got[0] == (0, expected[0])
    assert got[2] == (100, expected[2])
    assert len(rows) == 2


def test_truncated_frame_chunk_rejected():
    _, payload = _clip(w=4, h=4, n=1)
    db_at = payload.index(b"00db")
    mutated = bytearray(payload)
    struct.pack_into("<I", mutated, db_at + 4, 7)  # lie: 7-byte frame
    with pytest.raises(ValueError, match="frame chunk"):
        avi.decode_frames(bytes(mutated))


def test_sampling_grid_pure():
    # 5 frames @ 40 ms = 200 ms clip; 100 ms grid hits frames 0 and 2
    assert avi.sample_frame_indices(5, 40.0, 100) == [(0, 0), (2, 100)]
    # grid == native rate samples every frame at its own timestamp
    assert avi.sample_frame_indices(5, 40.0, 40) == [
        (0, 0), (1, 40), (2, 80), (3, 120), (4, 160),
    ]
    # sub-frame grid dedupes to one row per frame, first target wins
    assert avi.sample_frame_indices(2, 40.0, 15) == [(0, 0), (1, 45)]


# ------------------------------------------------- Spark strict path


def test_strict_sample_frames_runs_real_avi(spark):
    """The whole point: strict mode decodes real AVI bytes through the
    Arrow mapInPandas plumbing and emits native-frame RGB rows."""
    frames_a, clip_a = _clip(n=5, fps=25)  # 200 ms @ 40 ms/frame
    frames_b, clip_b = _clip(w=3, h=2, n=2, fps=10)  # 200 ms @ 100 ms/frame
    docs = spark.createDataFrame(
        [(1, clip_a, "unit"), (2, clip_b, "unit")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="video/avi")
    rows = sample_frames(media, frame_interval_ms=100, decode_mode="strict").collect()
    got = {(r.media_id, r.frame_idx): (r.frame_ts_ms, bytes(r.frame)) for r in rows}
    # clip A: targets 0,100 → native frames 0 and 2, real pixel bytes
    assert got[(1, 0)] == (0, frames_a[0])
    assert got[(1, 2)] == (100, frames_a[2])
    # clip B: targets 0,100 → frames 0 and 1
    assert got[(2, 0)] == (0, frames_b[0])
    assert got[(2, 1)] == (100, frames_b[1])
    assert len(rows) == 4


def test_strict_non_avi_raises_honestly(spark):
    docs = spark.createDataFrame(
        [(1, b"not a video", "unit")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="video/avi")
    with pytest.raises(Exception, match="NotImplementedError"):
        sample_frames(media, decode_mode="strict").collect()


def test_fake_path_still_covered(spark):
    """The deterministic stub keeps working for non-AVI payloads — the
    mm_frame_sample gate query depends on its exact skeleton."""
    docs = spark.createDataFrame(
        [(1, b"0123456789", "unit")], "doc_id long, blob binary, source string"
    )
    media = wrap_binary(docs, "blob", "doc_id", "source", mime="video/mp4")
    rows = sample_frames(media, frame_interval_ms=40, decode_mode="fake").collect()
    # 2 + 10 % 3 = 3 frames at 0/40/80 ms
    assert [(r.frame_idx, r.frame_ts_ms) for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        (0, 0), (1, 40), (2, 80),
    ]
