"""Minimal pure-stdlib WAV codec (wave module + numpy).

Second real media format after PNG (pngcodec.py): decodes RIFF/WAVE
PCM payloads (8/16/32-bit int, mono or multi-channel) and produces a
real 32-bin log-magnitude spectrum feature via numpy FFT — no external
audio libraries. Non-PCM encodings (float, ADPCM, mp3-in-wav) raise and
the multimodal layer falls back to the documented stub.

Runs inside Arrow-batched mapInPandas workers (multimodal.py): one
Python call per blob, numpy for the sample math.
"""

from __future__ import annotations

import io
import wave

import numpy as np

WAV_MAGIC = b"RIFF"

_WIDTH_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """-> (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width not in _WIDTH_DTYPE:
        raise NotImplementedError(f"sample width {width} unsupported (1/2/4)")
    data = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width]).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, centered at 128
        data = data - 128.0
        data /= 128.0
    else:
        data /= float(1 << (8 * width - 1))
    if nch > 1:
        data = data[: (len(data) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return data, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono float in [-1,1] -> 16-bit PCM WAV bytes (test fixture aid)."""
    pcm = np.clip(samples, -1.0, 1.0)
    ints = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def log_spectrum_feature(samples: np.ndarray, bins: int = 32,
                         max_samples: int = 65536) -> np.ndarray:
    """32-bin log-magnitude spectrum of (the head of) the signal,
    L1-normalized — the real audio feature vector."""
    x = samples[:max_samples]
    if len(x) == 0:
        return np.zeros(bins, dtype=np.float32)
    mag = np.abs(np.fft.rfft(x))
    if len(mag) < bins:
        mag = np.pad(mag, (0, bins - len(mag)))
    # aggregate the spectrum into `bins` equal bands
    edges = np.linspace(0, len(mag), bins + 1).astype(int)
    banded = np.array(
        [mag[a:b].sum() if b > a else 0.0 for a, b in zip(edges[:-1], edges[1:])]
    )
    feat = np.log1p(banded)
    total = feat.sum()
    return (feat / total if total > 0 else feat).astype(np.float32)


def wav_info(payload: bytes) -> dict:
    """Header-only metadata (no sample read): channels, sample width,
    rate, frame count, duration."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        return {
            "channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "sample_rate": rate,
            "n_frames": n,
            "duration_s": round(n / rate, 6) if rate else None,
        }
