"""Minimal in-tree BMP codec (stdlib struct + numpy) — real pixels for
the multimodal path, like pngcodec/wavcodec.

Covers the uncompressed BI_RGB subset (24/32-bit, BITMAPINFOHEADER,
bottom-up or top-down rows) that contains virtually every
programmatically-produced .bmp; anything else (RLE, palettes, 16-bit,
V4/V5 alpha channels beyond plain BGRA) raises so callers fall back to
the flagged stub instead of mis-decoding.

Capability gates, not stubs: decode_bmp returns REAL pixel arrays and
encode_bmp writes files any image viewer opens.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> HxWx3 uint8 RGB array."""
    if len(data) < 54 or not data.startswith(BMP_MAGIC):
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP variants")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP variant not supported (bpp={bpp}, compression={compression})"
        )
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    bottom_up = height > 0
    height = abs(height)
    bypp = bpp // 8
    stride = (width * bypp + 3) & ~3  # rows pad to 4 bytes
    need = pixel_off + stride * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)
    px = rows[:, : width * bypp].reshape(height, width, bypp)
    if bottom_up:
        px = px[::-1]
    # channel order on disk is BGR(A): keep the first three, reverse
    return np.ascontiguousarray(px[:, :, :3][:, :, ::-1])


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array -> 24-bit bottom-up BI_RGB BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects an HxWx3 uint8 array")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixels = rows.tobytes()
    file_hdr = struct.pack("<2sIHHI", BMP_MAGIC, 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return file_hdr + dib + pixels
