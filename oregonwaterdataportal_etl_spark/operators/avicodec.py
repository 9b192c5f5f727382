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


# ------------------------------------------------- uncompressed (DIB)


def avi_stream_format(payload: bytes) -> dict:
    """Video stream format from strh/strf (no frame decode):
    handler fourcc, biCompression, bit depth, dimensions."""
    _require_avi(payload)
    for four, start, stop in _walk_chunks(payload, 12, len(payload)):
        if four != b"hdrl":
            continue
        for cc, s, e in _walk_chunks(payload, start, stop):
            if cc != b"strl":
                continue
            handler = None
            for c2, s2, e2 in _walk_chunks(payload, s, e):
                if c2 == b"strh" and e2 - s2 >= 8:
                    if payload[s2 : s2 + 4] != b"vids":
                        break  # audio/other stream: skip this strl
                    handler = payload[s2 + 4 : s2 + 8]
                elif c2 == b"strf" and e2 - s2 >= 20 and handler is not None:
                    _sz, w, h, _planes, bits = struct.unpack_from(
                        "<IiiHH", payload, s2
                    )
                    compression = payload[s2 + 16 : s2 + 20]
                    return {
                        "handler": handler,
                        "compression": compression,
                        "bits": bits,
                        "width": w,
                        "height": abs(h),
                        "bottom_up": h > 0,
                    }
    raise ValueError("AVI has no video stream format")


def encode_avi_rawrgb(
    frames: list["np.ndarray"], fps: int = 30
) -> bytes:
    """Pack uncompressed (H, W, 3) uint8 RGB frames as a raw-DIB AVI
    (biCompression=0, 24bpp bottom-up BGR rows padded to 4 bytes —
    the standard uncompressed 'DIB ' stream)."""
    import numpy as np

    if not frames:
        raise ValueError("cannot encode an AVI with zero frames")
    h, w = frames[0].shape[:2]
    row_pad = (-(w * 3)) % 4
    dibs = []
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be (H, W, 3) uint8 of one shape")
        bgr = f[::-1, :, ::-1]  # bottom-up, RGB -> BGR
        if row_pad:
            rows = np.zeros((h, w * 3 + row_pad), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            dibs.append(rows.tobytes())
        else:
            dibs.append(bgr.tobytes())
    frame_bytes = len(dibs[0])
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1), frame_bytes * fps, 0, 0x10,
        len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), frame_bytes,
                      0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"\x00\x00\x00\x00",
        frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", d) for d in dibs))
    idx_entries, off = [], 4
    for d in dibs:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(d)))
        off += 8 + len(d) + (len(d) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_rgb_frames(payload: bytes) -> list["np.ndarray"]:
    """Decode a raw-DIB AVI's frames to (H, W, 3) uint8 RGB arrays."""
    import numpy as np

    fmt = avi_stream_format(payload)
    if fmt["compression"] != b"\x00\x00\x00\x00" or fmt["bits"] != 24:
        raise ValueError("not an uncompressed 24-bit DIB AVI")
    w, h = fmt["width"], fmt["height"]
    stride = w * 3 + ((-(w * 3)) % 4)
    out = []
    for raw in decode_avi_frames(payload):
        if len(raw) < stride * h:
            raise ValueError("truncated DIB frame")
        rows = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        if fmt["bottom_up"]:
            bgr = bgr[::-1]
        out.append(bgr[:, :, ::-1].copy())
    return out
