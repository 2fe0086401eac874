"""Real WAV decode through the Arrow multimodal plumbing
(operators/audio.py): synthesized PCM bytes round-trip through
mapInPandas with the signal statistics a quality filter needs."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from data_spark.operators.audio import _decode_wav, wav_features


def _make_wav(
    freq: float = 440.0,
    rate: int = 8000,
    seconds: float = 0.5,
    amplitude: float = 0.5,
    channels: int = 1,
) -> bytes:
    buf = io.BytesIO()
    n = int(rate * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            v = int(amplitude * 32767 * math.sin(2 * math.pi * freq * i / rate))
            frames += struct.pack("<h", v) * channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_wav_parses_real_pcm():
    rate, channels, x = _decode_wav(_make_wav(rate=8000, seconds=0.25))
    assert rate == 8000 and channels == 1
    assert len(x) == 2000
    assert -1.0 <= x.min() and x.max() <= 1.0


def test_wav_features_through_map_in_pandas(spark):
    rows = [
        (1, _make_wav(amplitude=0.5, seconds=0.5)),
        (2, _make_wav(amplitude=0.1, seconds=0.25, channels=2)),
        # silence: all-zero samples
        (3, _make_wav(amplitude=0.0, seconds=0.125)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in wav_features(df).collect()}

    # a sine of amplitude A has RMS A/sqrt(2)
    assert got[1].sample_rate == 8000
    assert got[1].duration_ms == 500
    assert got[1].rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)
    assert got[1].peak == pytest.approx(0.5, rel=1e-2)
    assert len(got[1].window_rms) == 8
    # every window of a steady tone carries the same energy
    assert max(got[1].window_rms) - min(got[1].window_rms) < 0.01

    assert got[2].n_channels == 2
    assert got[2].rms == pytest.approx(0.1 / math.sqrt(2), rel=1e-2)

    assert got[3].rms == 0.0 and got[3].peak == 0.0
    # the loudness ordering a quality filter would use
    assert got[1].rms > got[2].rms > got[3].rms


def test_wav_features_rejects_non_pcm():
    with pytest.raises(Exception):
        _decode_wav(b"ID3\x03\x00not-a-wav-payload")
