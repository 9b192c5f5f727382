"""Paletted + RLE BMP decode (bmpcodec round 5)."""

import struct

import numpy as np
import pytest

from oregonwaterdataportal_etl_spark.operators.bmpcodec import (
    decode_bmp,
    encode_bmp,
    encode_bmp_paletted,
    encode_bmp_rle8,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_paletted_bmp_roundtrip(bpp):
    n = 1 << bpp
    palette = RNG.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = RNG.integers(0, n, size=(9, 13), dtype=np.uint8)  # odd width
    got = decode_bmp(encode_bmp_paletted(idx, palette, bpp=bpp))
    assert np.array_equal(got, palette[idx])


def test_rle8_bmp_roundtrip():
    palette = RNG.integers(0, 256, size=(256, 3), dtype=np.uint8)
    # runs + noise: both encoded-run shapes exercised
    idx = np.repeat(RNG.integers(0, 256, size=(12, 5), dtype=np.uint8), 4, axis=1)
    idx[3, 7] = 250  # break a run
    got = decode_bmp(encode_bmp_rle8(idx, palette))
    assert np.array_equal(got, palette[idx])


def test_rle8_delta_and_absolute_runs():
    """Hand-built stream: absolute run, delta skip (pixels stay
    palette entry 0), end-of-bitmap."""
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                       dtype=np.uint8)
    # width 6, height 2; stored bottom-up: first stored row = image row 1
    stream = (
        b"\x00\x03\x01\x02\x03\x00"   # absolute run of 3 (word-aligned pad)
        + b"\x02\x02"                  # encoded run: 2 pixels of color 2
        + b"\x00\x00"                  # end of line
        + b"\x00\x02\x02\x00"          # delta: skip 2 pixels right
        + b"\x03\x01"                  # 3 pixels of color 1
        + b"\x00\x01"                  # end of bitmap
    )
    hdr = (
        struct.pack("<2sIHHI", b"BM", 0, 0, 0, 54 + 16)
        + struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 8, 1, len(stream), 0, 0, 4, 0)
    )
    bgrx = np.zeros((4, 4), dtype=np.uint8)
    bgrx[:, :3] = palette[:, ::-1]
    payload = hdr + bgrx.tobytes() + stream
    got = decode_bmp(payload)
    expect = np.zeros((2, 6, 3), dtype=np.uint8)
    expect[1, 0:3] = palette[[1, 2, 3]]   # bottom row: absolute run
    expect[1, 3:5] = palette[2]           # then encoded run
    expect[0, 2:5] = palette[1]           # top row: after delta skip
    assert np.array_equal(got, expect)


def test_truecolor_bmp_still_works():
    arr = RNG.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_16bit_bmp_555_and_565():
    """Hand-built 16-bit pixels: default RGB555 (compression 0) and
    BI_BITFIELDS RGB565, both with bit-replicated 8-bit expansion."""
    def bmp16(vals, w, h, compression, masks=None):
        stride = (w * 2 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        arr = np.array(vals, dtype="<u2").reshape(h, w)
        rows[:, : w * 2] = arr.view(np.uint8).reshape(h, w * 2)
        extra = struct.pack("<III", *masks) if masks else b""
        off = 54 + len(extra)
        hdr = struct.pack("<2sIHHI", b"BM", off + rows.nbytes, 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 16, compression,
                          rows.nbytes, 0, 0, 0, 0)  # top-down
        return hdr + dib + extra + rows.tobytes()

    # RGB555: r=31 g=0 b=0 -> 0x7C00 -> pure red 255
    got = decode_bmp(bmp16([0x7C00, 0x03E0, 0x001F, 0], 4, 1, 0))
    assert got.shape == (1, 4, 3)
    assert list(got[0, 0]) == [255, 0, 0]
    assert list(got[0, 1]) == [0, 255, 0]
    assert list(got[0, 2]) == [0, 0, 255]
    assert list(got[0, 3]) == [0, 0, 0]
    # RGB565 via BI_BITFIELDS: g has 6 bits
    masks = (0xF800, 0x07E0, 0x001F)
    got = decode_bmp(bmp16([0xF800, 0x07E0, 0x001F], 3, 1, 3, masks))
    assert list(got[0, 0]) == [255, 0, 0]
    assert list(got[0, 1]) == [0, 255, 0]
    assert list(got[0, 2]) == [0, 0, 255]
    # mid-range green: 32/63 -> replicated 8-bit 130
    got = decode_bmp(bmp16([32 << 5], 1, 1, 3, masks))
    assert got[0, 0, 1] == (32 << 2) | (32 >> 4)
