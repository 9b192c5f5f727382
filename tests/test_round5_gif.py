"""Round 5: real in-tree GIF codec (LZW, GIF87a/89a, animation).

Pins: LZW stream roundtrip under dictionary-reset pressure; exact
palette roundtrip (decode(encode(x)) == x for <=256-color frames);
animated sequences with delays; interlaced decode (hand-built stream
— the encoder never emits interlace); transparency + disposal
composition; and the Spark multimodal wiring (features / probe /
frame sampling / resize) treating image/gif as a REAL codec.
"""

import numpy as np
import pytest

from oregonwaterdataportal_etl_spark.operators.gifcodec import (
    _sub_blocks,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    gif_info,
    lzw_decode,
    lzw_encode,
)


def _pal_img(rng, h, w, levels=6):
    return (rng.integers(0, levels, size=(h, w, 3), dtype=np.uint8) * 51).astype(
        np.uint8
    )


def test_lzw_roundtrip_with_table_resets():
    rng = np.random.default_rng(11)
    for mcs in (2, 3, 5, 8):
        for n in (0, 1, 17, 4000, 50000):
            px = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8).tobytes()
            assert lzw_decode(lzw_encode(px, mcs), mcs) == px
    # long low-entropy run forces 4096-entry dictionary resets
    px = b"\x01" * 20000 + bytes(rng.integers(0, 4, 30000, dtype=np.uint8)) * 2
    assert lzw_decode(lzw_encode(px, 2), 2) == px


def test_gif_exact_roundtrip_and_info():
    rng = np.random.default_rng(3)
    img = _pal_img(rng, 37, 53)
    enc = encode_gif(img)
    assert np.array_equal(decode_gif(enc), img)
    info = gif_info(enc)
    assert (info["width"], info["height"], info["n_frames"]) == (53, 37, 1)

    frames = [img, np.roll(img, 5, axis=1), np.roll(img, 11, axis=0)]
    enc2 = encode_gif(frames, delay_cs=10)
    dec, delays = decode_gif_frames(enc2)
    assert len(dec) == 3
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    assert delays == [10, 10, 10]
    info2 = gif_info(enc2)
    assert info2["n_frames"] == 3
    assert info2["duration_s"] == pytest.approx(0.3)


def test_gif_quantized_fallback_over_256_colors():
    rng = np.random.default_rng(5)
    big = rng.integers(0, 256, size=(24, 31, 3), dtype=np.uint8)
    dec = decode_gif(encode_gif(big))
    assert dec.shape == big.shape
    assert float(np.abs(dec.astype(int) - big.astype(int)).mean()) < 30


def test_gif_interlaced_decode():
    """Hand-build an interlaced stream: rows stored in the 8/8/4/2
    pass order must come back in display order."""
    import struct

    h, w = 13, 7
    img = (np.arange(h * w, dtype=np.uint8).reshape(h, w) % 4) * 64
    rgb = np.stack([img] * 3, axis=-1)
    pal = np.array([[0, 0, 0], [64, 64, 64], [128, 128, 128], [192, 192, 192]],
                   dtype=np.uint8)
    idx = img // 64
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, h, st)]
    stored = idx[np.asarray(order)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # 4-entry GCT
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace bit
    out.append(2)
    out += _sub_blocks(lzw_encode(stored.astype(np.uint8).tobytes(), 2))
    out += b"\x3b"
    assert np.array_equal(decode_gif(bytes(out)), rgb)


def test_gif_transparency_and_disposal_composition():
    """Frame 2 is a 2x2 patch at (1,1) with a transparent index and
    disposal=2: composition keeps the underlying frame-1 pixels where
    transparent, and frame 3 sees the patch region restored to
    background (black)."""
    import struct

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 0, 0]],
                   dtype=np.uint8)
    f1_idx = np.zeros((4, 4), np.uint8)  # all red
    patch = np.array([[1, 2], [2, 1]], np.uint8)  # green/blue; 2 = transparent
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
    out += pal.tobytes()
    # frame 1: full canvas, no GCE
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    out.append(2)
    out += _sub_blocks(lzw_encode(f1_idx.tobytes(), 2))
    # frame 2: GCE disposal=2, transparent index 2; 2x2 patch at (1,1)
    out += b"\x21\xf9\x04" + bytes([(2 << 2) | 1]) + struct.pack("<H", 5) + b"\x02\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    out.append(2)
    out += _sub_blocks(lzw_encode(patch.tobytes(), 2))
    # frame 3: full canvas again, index 1 everywhere
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    out.append(2)
    out += _sub_blocks(lzw_encode(np.ones((4, 4), np.uint8).tobytes(), 2))
    out += b"\x3b"

    frames, delays = decode_gif_frames(bytes(out))
    assert len(frames) == 3
    assert np.array_equal(frames[0], pal[f1_idx])
    # frame 2: red canvas, green at (1,1) and (2,2); transparent cells stay red
    exp2 = pal[f1_idx].copy()
    exp2[1, 1] = pal[1]
    exp2[2, 2] = pal[1]
    assert np.array_equal(frames[1], exp2)
    assert delays[1] == 5
    assert np.array_equal(frames[2], pal[np.ones((4, 4), np.uint8)])


def test_gif_malformed_raises():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x00")
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + bytes(32))
    with pytest.raises(ValueError):
        encode_gif([])


def test_gif_spark_multimodal_wiring(spark):
    from oregonwaterdataportal_etl_spark.operators import multimodal
    from oregonwaterdataportal_etl_spark.operators.pngcodec import (
        luminance_histogram,
    )

    rng = np.random.default_rng(9)
    img = _pal_img(rng, 16, 24)
    frames = [img, np.roll(img, 3, axis=0), np.roll(img, 6, axis=0),
              np.roll(img, 9, axis=0)]
    anim = encode_gif(frames, delay_cs=8)
    media = spark.createDataFrame(
        [(1, "image/gif", anim, {})], schema=multimodal.MEDIA_SCHEMA
    )

    feat = multimodal.extract_features(media).collect()[0]
    assert feat["decoded"] is True
    assert np.allclose(feat["feature"], luminance_histogram(img, bins=32))

    probe = multimodal.probe_media(media).collect()[0]
    assert (probe["width"], probe["height"], probe["n_frames"]) == (24, 16, 4)
    assert probe["probed"] is True
    assert probe["duration_s"] == pytest.approx(0.32)

    rows = sorted(
        multimodal.sample_frames(media, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2]
    assert all(r["decoded"] for r in rows)
    assert np.array_equal(decode_gif(bytes(rows[1]["frame"])), frames[2])

    resized = multimodal.resize_images(media, width=12, height=8).collect()[0]
    rframes, rdelays = decode_gif_frames(bytes(resized["payload"]))
    assert len(rframes) == 4 and rframes[0].shape == (8, 12, 3)
    assert rdelays == [8, 8, 8, 8]
