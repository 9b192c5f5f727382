"""Round 5: progressive JPEG (SOF2) — full decode + encode.

The load-bearing invariant: progressive scans are a REORDERING of the
same quantized coefficients the baseline encoder writes, so at equal
quality decode(progressive(x)) must equal decode(baseline(x))
BIT-FOR-BIT. Any bug in spectral selection, successive approximation,
DC/AC refinement, EOB handling, or the encoder's buffered correction
bits breaks exact equality somewhere in the matrix below.
"""

import numpy as np
import pytest

from oregonwaterdataportal_etl_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    jpeg_info,
)


def _images():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:40, 0:56]
    return {
        "gradient-gray": ((yy * 4 + xx) % 256).astype(np.uint8),
        "noise-rgb": rng.integers(0, 256, (33, 47, 3), dtype=np.uint8),
        "smooth-rgb": np.stack(
            [((yy * 3 + xx * 2 + c * 20) % 256) for c in range(3)], axis=-1
        ).astype(np.uint8)[:40, :56],
        "noise-gray": rng.integers(0, 256, (24, 24), dtype=np.uint8),
        "flat-rgb": np.full((16, 16, 3), 130, dtype=np.uint8),
        "odd-dims": rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
    }


@pytest.mark.parametrize("quality", [85, 50])
def test_progressive_equals_baseline_bit_for_bit(quality):
    for name, img in _images().items():
        base = encode_jpeg(img, quality=quality)
        prog = encode_jpeg_progressive(img, quality=quality)
        assert jpeg_info(prog)["progressive"] is True
        assert jpeg_info(base)["progressive"] is False
        a = decode_jpeg(base)
        b = decode_jpeg(prog)
        assert np.array_equal(a, b), f"{name} q={quality}: decode mismatch"


def test_progressive_decode_is_lossy_close_to_source():
    img = _images()["smooth-rgb"]
    dec = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert dec.shape == img.shape
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 2.5


def test_truncated_progressive_still_flags():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x0b" + bytes(9) + b"\xff\xd9")
