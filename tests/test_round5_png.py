"""PNG palette / sub-byte / 16-bit / Adam7 decode (pngcodec round 5)."""

import numpy as np
import pytest

from oregonwaterdataportal_etl_spark.operators.pngcodec import (
    decode_png,
    encode_png,
    encode_png_16bit,
    encode_png_paletted,
)

RNG = np.random.default_rng(42)


def test_adam7_interlaced_equals_progressive():
    for shape in [(1, 1, 3), (7, 5, 3), (16, 16, 4), (9, 3, 1)]:
        arr = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        plain = decode_png(encode_png(arr))
        inter = decode_png(encode_png(arr, interlace=True))
        assert np.array_equal(plain, arr.reshape(plain.shape))
        assert np.array_equal(inter, plain)


def test_palette_png_expands_to_rgb():
    palette = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(10, 7), dtype=np.uint8)
    got = decode_png(encode_png_paletted(idx, palette))
    assert got.shape == (10, 7, 3)
    assert np.array_equal(got, palette[idx])


def test_palette_trns_adds_alpha():
    palette = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    trns = np.array([0], dtype=np.uint8)  # entry 0 fully transparent
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    got = decode_png(encode_png_paletted(idx, palette, trns=trns))
    assert got.shape == (2, 2, 4)
    assert np.array_equal(got[..., 3], np.array([[0, 255], [255, 0]]))
    assert np.array_equal(got[..., :3], palette[idx])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_depths(depth):
    n = 1 << depth
    palette = RNG.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = RNG.integers(0, n, size=(6, 11), dtype=np.uint8)  # odd width
    got = decode_png(encode_png_paletted(idx, palette, depth=depth))
    assert np.array_equal(got, palette[idx])


def test_16bit_high_byte_downconversion():
    arr8 = RNG.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    arr16 = arr8.astype(np.uint16) * 257  # x*257: high byte == x exactly
    got = decode_png(encode_png_16bit(arr16))
    assert np.array_equal(got, arr8)


def test_interlaced_palette_and_16bit():
    palette = RNG.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = RNG.integers(0, 8, size=(13, 9), dtype=np.uint8)
    got = decode_png(encode_png_paletted(idx, palette, depth=4, interlace=True))
    assert np.array_equal(got, palette[idx])
    arr16 = RNG.integers(0, 256, size=(11, 6, 1), dtype=np.uint16) * 257
    got16 = decode_png(encode_png_16bit(arr16, interlace=True))
    assert np.array_equal(got16, (arr16 >> 8).astype(np.uint8))
