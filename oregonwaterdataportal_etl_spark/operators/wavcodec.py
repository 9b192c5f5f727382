"""Minimal pure-stdlib WAV codec (wave module + numpy).

Second real media format after PNG (pngcodec.py): decodes RIFF/WAVE
payloads and produces a real 32-bin log-magnitude spectrum feature
via numpy FFT — no external audio libraries. Supported encodings:

* integer PCM (format 1; 8/16/32-bit, any channel count) via the
  stdlib ``wave`` module;
* IEEE float32/float64 (format 3);
* G.711 mu-law and A-law (formats 7 and 6) — vectorized numpy
  expansion of the companding laws, encoders included so tests pin
  the decode against the exact inverse;
* IMA ADPCM (format 0x11, mono) — block-structured 4-bit predictive
  coding; the recurrence is inherently sequential so the inner loop
  is per-nibble Python over numpy scalars (fine for feature
  extraction on bounded blobs; documented cost, not a hot path).

Anything else (mp3-in-wav, stereo ADPCM, ...) raises and the
multimodal layer keeps its honest decoded=false flag.

Runs inside Arrow-batched mapInPandas workers (multimodal.py): one
Python call per blob, numpy for the sample math.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

WAV_MAGIC = b"RIFF"

_WIDTH_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}

_FMT_PCM, _FMT_FLOAT, _FMT_ALAW, _FMT_MULAW, _FMT_IMA = 1, 3, 6, 7, 0x11


def _riff_chunks(payload: bytes) -> dict[bytes, bytes]:
    """fourcc -> raw chunk body for a RIFF/WAVE container (first
    occurrence wins; word-aligned skipping)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        out.setdefault(cc, body)
        pos += 8 + size + (size & 1)
    return out


def _parse_fmt(fmt: bytes) -> dict:
    tag, nch, rate, _byterate, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    d = {
        "format_tag": tag,
        "channels": nch,
        "sample_rate": rate,
        "block_align": block_align,
        "bits_per_sample": bits,
    }
    if len(fmt) >= 20 and tag == _FMT_IMA:
        (cb,) = struct.unpack_from("<H", fmt, 16)
        if cb >= 2:
            (d["samples_per_block"],) = struct.unpack_from("<H", fmt, 18)
    return d


# ---- G.711 companding ------------------------------------------------
def mulaw_decode_bytes(data: bytes) -> np.ndarray:
    """mu-law bytes -> int16 samples (ITU-T G.711 expansion)."""
    u = ~np.frombuffer(data, dtype=np.uint8)
    sign = u & 0x80
    exp = (u.astype(np.int32) >> 4) & 7
    mant = u.astype(np.int32) & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def mulaw_encode_samples(samples: np.ndarray) -> bytes:
    """int16 samples -> mu-law bytes (the exact G.711 inverse)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    u = ~(sign | (exp << 4) | mant)
    return u.astype(np.uint8).tobytes()


def alaw_decode_bytes(data: bytes) -> np.ndarray:
    """A-law bytes -> int16 samples (G.711 expansion)."""
    a = np.frombuffer(data, dtype=np.uint8) ^ 0x55
    sign = a & 0x80
    exp = (a.astype(np.int32) >> 4) & 7
    mant = a.astype(np.int32) & 0x0F
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def alaw_encode_samples(samples: np.ndarray) -> bytes:
    """int16 samples -> A-law bytes (the exact G.711 inverse)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    exp = np.maximum((np.floor(np.log2(np.maximum(mag, 1))) - 7), 0).astype(
        np.int32
    )
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    a = (sign | (exp << 4) | mant) ^ 0x55
    return a.astype(np.uint8).tobytes()


# ---- IMA ADPCM -------------------------------------------------------
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)
_IMA_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32
)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[nibble])))
    return pred, index


def ima_adpcm_decode(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA-ADPCM data chunk -> int16 samples. Each block: 4-byte
    header (predictor int16, step index, reserved) then 4-bit samples,
    low nibble first."""
    out: list[int] = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off:off + block_align]
        pred = struct.unpack_from("<h", block, 0)[0]
        index = min(88, block[2])
        out.append(pred)
        for b in block[4:]:
            for nibble in (b & 0x0F, b >> 4):
                pred, index = _ima_step(pred, index, nibble)
                out.append(pred)
    return np.array(out, dtype=np.int16)


def ima_adpcm_encode(samples: np.ndarray, samples_per_block: int = 505) -> tuple[bytes, int]:
    """Mono int16 -> (IMA-ADPCM data bytes, block_align). Standard
    encoder: first sample rides the block header verbatim; each later
    sample quantizes its prediction error to 4 bits."""
    x = samples.astype(np.int32)
    data_bytes_per_block = (samples_per_block - 1 + 1) // 2  # nibbles->bytes
    block_align = 4 + data_bytes_per_block
    out = bytearray()
    index = 0
    for off in range(0, len(x), samples_per_block):
        blk = x[off:off + samples_per_block]
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles: list[int] = []
        for s in blk[1:]:
            step = int(_IMA_STEPS[index])
            diff = int(s) - pred
            nibble = 8 if diff < 0 else 0
            diff = abs(diff)
            mask = 4
            temp = step
            while mask:
                if diff >= temp:
                    nibble |= mask
                    diff -= temp
                temp >>= 1
                mask >>= 1
            pred, index = _ima_step(pred, index, nibble)
            nibbles.append(nibble)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        # pad the block to block_align
        out += b"\x00" * (block_align - 4 - (len(nibbles) // 2))
    return bytes(out), block_align


def _build_wav(fmt_body: bytes, data: bytes) -> bytes:
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + (b"" if len(fmt_body) % 2 == 0 else b"\x00")
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"" if len(data) % 2 == 0 else b"\x00")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_g711(samples: np.ndarray, rate: int = 8000, law: str = "mulaw") -> bytes:
    """mono float in [-1,1] -> G.711 WAV bytes (format 7 or 6)."""
    ints = (np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int16)
    body = (
        mulaw_encode_samples(ints) if law == "mulaw" else alaw_encode_samples(ints)
    )
    tag = _FMT_MULAW if law == "mulaw" else _FMT_ALAW
    fmt = struct.pack("<HHIIHHH", tag, 1, rate, rate, 1, 8, 0)
    return _build_wav(fmt, body)


def encode_wav_ima(samples: np.ndarray, rate: int = 8000) -> bytes:
    """mono float in [-1,1] -> IMA-ADPCM WAV bytes (format 0x11)."""
    ints = (np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int16)
    spb = 505
    data, block_align = ima_adpcm_encode(ints, samples_per_block=spb)
    byterate = rate * block_align // spb
    fmt = struct.pack("<HHIIHHHH", _FMT_IMA, 1, rate, byterate, block_align, 4, 2, spb)
    return _build_wav(fmt, data)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """-> (mono float64 samples in [-1, 1], sample_rate)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except wave.Error:
        return _decode_wav_nonpcm(payload)
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


def _decode_wav_nonpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """Formats the stdlib wave module rejects: IEEE float, G.711
    mu-law/A-law, mono IMA ADPCM."""
    chunks = _riff_chunks(payload)
    if b"fmt " not in chunks or b"data" not in chunks:
        raise ValueError("WAV payload lacks fmt/data chunks")
    fmt = _parse_fmt(chunks[b"fmt "])
    data = chunks[b"data"]
    tag, nch, rate = fmt["format_tag"], fmt["channels"], fmt["sample_rate"]
    if tag == _FMT_FLOAT:
        dt = np.dtype("<f4") if fmt["bits_per_sample"] == 32 else np.dtype("<f8")
        samples = np.frombuffer(
            data[: (len(data) // dt.itemsize) * dt.itemsize], dtype=dt
        ).astype(np.float64)
    elif tag == _FMT_MULAW:
        samples = mulaw_decode_bytes(data).astype(np.float64) / 32768.0
    elif tag == _FMT_ALAW:
        samples = alaw_decode_bytes(data).astype(np.float64) / 32768.0
    elif tag == _FMT_IMA:
        if nch != 1:
            raise NotImplementedError("stereo IMA ADPCM unsupported")
        samples = (
            ima_adpcm_decode(data, fmt["block_align"]).astype(np.float64)
            / 32768.0
        )
        return samples, rate
    else:
        raise NotImplementedError(f"WAV format tag {tag:#x} unsupported")
    if nch > 1:
        samples = samples[: (len(samples) // nch) * nch].reshape(-1, nch).mean(
            axis=1
        )
    return samples, rate


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
    rate, frame count, duration. Falls back to the raw RIFF parse for
    encodings the stdlib wave module rejects (float, G.711, ADPCM)."""
    try:
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
    except wave.Error:
        chunks = _riff_chunks(payload)
        fmt = _parse_fmt(chunks[b"fmt "])
        data_len = len(chunks.get(b"data", b""))
        rate, nch = fmt["sample_rate"], fmt["channels"]
        if fmt["format_tag"] == _FMT_IMA:
            spb = fmt.get("samples_per_block", (fmt["block_align"] - 4) * 2 + 1)
            n = (data_len // fmt["block_align"]) * spb
        else:
            bytes_per_frame = max(1, nch * max(1, fmt["bits_per_sample"] // 8))
            n = data_len // bytes_per_frame
        return {
            "channels": nch,
            "sample_width": max(1, fmt["bits_per_sample"] // 8),
            "sample_rate": rate,
            "n_frames": n,
            "duration_s": round(n / rate, 6) if rate else None,
        }
