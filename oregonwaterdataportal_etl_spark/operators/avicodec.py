"""Minimal in-tree Motion-JPEG AVI container codec (pure stdlib).

AVI is a RIFF container: ``RIFF('AVI ' LIST('hdrl' avih LIST('strl'
strh strf)) LIST('movi' 00dc...) [idx1])``. For Motion-JPEG each
``00dc`` chunk is a complete baseline JPEG, which `jpegcodec` already
decodes — so frame SAMPLING (the Spark-side operator) plus frame
DECODE are both real here, no ffmpeg.

Scope (documented limits, same honesty contract as the other codecs):
single video stream, MJPG/raw-dc chunks only (``00dc``/``00db``),
no interleaved audio demux, no OpenDML (AVIX) extension lists. Files
outside that scope raise ValueError and the multimodal layer falls
back to its flagged ``decoded=false`` stub.

Reference parity note: the reference ETL treats media attachments as
opaque binary payloads with typed metadata (SURVEY.md §2.1 S8); the
frame-sampling operator itself is the training-data-pipeline extension
this engine adds on top.
"""

from __future__ import annotations

import struct
from typing import Iterator

AVI_MAGIC = b"RIFF"


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 30
) -> bytes:
    """Pack JPEG frame payloads into a minimal single-stream MJPG AVI."""
    if not frames:
        raise ValueError("cannot encode an AVI with zero frames")
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # microseconds per frame
        max_bytes * fps,  # suggested max bytes/sec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX (we do write idx1)
        len(frames), 0, 1, max_bytes, width, height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), max_bytes,
                      0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the start of the
    # 'movi' list type fourcc (the common convention)
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc_or_listtype, payload_start, payload_end); LIST
    chunks yield their list type and interior bounds."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        start = pos + 8
        stop = min(start + size, end)
        if fourcc == b"LIST" and size >= 4:
            yield buf[start : start + 4], start + 4, stop
        else:
            yield fourcc, start, stop
        pos = start + size + (size % 2)


def _require_avi(payload: bytes) -> None:
    if len(payload) < 12 or payload[:4] != AVI_MAGIC or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")


def decode_avi_frames(payload: bytes) -> list[bytes]:
    """All video frame payloads (``00dc``/``00db`` chunks of the movi
    list), in stream order. Each is a complete encoded frame (JPEG for
    MJPG AVIs) — decode with jpegcodec.decode_jpeg."""
    _require_avi(payload)
    frames: list[bytes] = []
    for four, start, stop in _walk_chunks(payload, 12, len(payload)):
        if four == b"movi":
            for cc, s, e in _walk_chunks(payload, start, stop):
                if cc in (b"00dc", b"00db"):
                    frames.append(payload[s:e])
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return frames


def avi_info(payload: bytes) -> dict:
    """Container metadata from the avih header (no frame decode)."""
    _require_avi(payload)
    for four, start, stop in _walk_chunks(payload, 12, len(payload)):
        if four == b"hdrl":
            for cc, s, e in _walk_chunks(payload, start, stop):
                if cc == b"avih" and e - s >= 40:
                    v = struct.unpack_from("<10I", payload, s)
                    return {
                        "us_per_frame": v[0],
                        "total_frames": v[4],
                        "streams": v[6],
                        "width": v[8],
                        "height": v[9],
                        "fps": round(1_000_000 / v[0], 3) if v[0] else None,
                    }
    raise ValueError("AVI missing avih header")
