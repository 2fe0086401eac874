"""Real audio decode for the multimodal tier: WAV/PCM parses with the
pure stdlib (``wave`` + numpy frombuffer), so — like the vendored PNG
codec closed the image modality (operators/png.py) — the audio path
executes REAL bytes in this container instead of stubbing behind an
absent torchaudio/ffmpeg.

Feature extraction runs as Arrow-batched ``mapInPandas`` over opaque
binary columns (the house multimodal plumbing, operators/multimodal.py):
one decode per row inside a batch, numpy vector math for the signal
statistics, nothing row-at-a-time through Python ↔ JVM. Compressed
formats (mp3/ogg) have no stdlib decoder; they raise honestly in
``strict`` mode exactly as multimodal's image path does when Pillow is
absent.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_frames long, "
    "duration_ms long, rms double, peak double, window_rms array<double>"
)

_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM payload → (sample_rate, n_channels, mono
    float signal in [-1, 1])."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, channels, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        if width not in _WIDTH_DTYPE:
            raise ValueError(f"unsupported PCM sample width {width}")
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width]).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned
        x = x - 128.0
    x /= float(1 << (8 * width - 1))
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return rate, channels, x


def wav_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_windows: int = 8,
) -> DataFrame:
    """Signal features per WAV payload: sample rate, channel count,
    frame count, duration, overall RMS and peak (mono-mixed, [-1, 1]
    scale), plus ``n_windows`` equal-split window RMS values — the
    energy envelope a silence/clipping quality filter reads. Arrow
    batches in, Arrow batches out; numpy does the per-batch math."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, channels, x = _decode_wav(bytes(payload))
                n = len(x)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                peak = float(np.max(np.abs(x))) if n else 0.0
                wr = []
                for w_i in range(n_windows):
                    seg = x[w_i * n // n_windows : (w_i + 1) * n // n_windows]
                    wr.append(
                        float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0
                    )
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": rate,
                        "n_channels": channels,
                        "n_frames": n,
                        "duration_ms": int(n * 1000 // rate) if rate else 0,
                        "rms": rms,
                        "peak": peak,
                        "window_rms": wr,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
