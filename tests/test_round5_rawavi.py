"""Round 5: uncompressed 24-bit DIB AVI — the non-MJPEG video path.

Raw-RGB frames roundtrip bit-exactly through the RIFF container
(bottom-up padded BGR rows), and the multimodal layer treats raw AVIs
as a REAL codec: first-frame histogram features, per-frame resize
that stays raw, and frame sampling that re-encodes sampled frames as
self-contained BMP payloads.
"""

import numpy as np

from oregonwaterdataportal_etl_spark.operators.avicodec import (
    avi_info,
    avi_stream_format,
    decode_avi_rgb_frames,
    encode_avi_rawrgb,
)


def _frames(n=6, h=11, w=13):
    rng = np.random.default_rng(21)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_rawrgb_avi_roundtrip_exact():
    frames = _frames()  # odd width exercises 4-byte row padding
    avi = encode_avi_rawrgb(frames, fps=10)
    fmt = avi_stream_format(avi)
    assert fmt["handler"] == b"DIB " and fmt["bits"] == 24
    assert fmt["compression"] == b"\x00\x00\x00\x00"
    dec = decode_avi_rgb_frames(avi)
    assert len(dec) == 6
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    info = avi_info(avi)
    assert (info["total_frames"], info["width"], info["height"]) == (6, 13, 11)


def test_rawrgb_avi_multimodal_wiring(spark):
    from oregonwaterdataportal_etl_spark.operators import multimodal
    from oregonwaterdataportal_etl_spark.operators.bmpcodec import decode_bmp
    from oregonwaterdataportal_etl_spark.operators.pngcodec import (
        luminance_histogram,
    )

    frames = _frames(5, 16, 24)
    avi = encode_avi_rawrgb(frames, fps=8)
    media = spark.createDataFrame(
        [(1, "video/avi", avi, {})], schema=multimodal.MEDIA_SCHEMA
    )

    feat = multimodal.extract_features(media).collect()[0]
    assert feat["decoded"] is True
    assert np.allclose(feat["feature"], luminance_histogram(frames[0], bins=32))

    rows = sorted(
        multimodal.sample_frames(media, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert all(r["decoded"] for r in rows)
    # sampled frames are self-contained BMPs, pixel-exact (raw path)
    assert np.array_equal(decode_bmp(bytes(rows[1]["frame"])), frames[2])

    resized = multimodal.resize_images(media, width=12, height=8).collect()[0]
    rframes = decode_avi_rgb_frames(bytes(resized["payload"]))
    assert len(rframes) == 5 and rframes[0].shape == (8, 12, 3)
    # raw path stays raw: nearest-neighbor of frame 0 is pixel-exact
    from oregonwaterdataportal_etl_spark.operators.pngcodec import resize_nearest

    assert np.array_equal(rframes[0], resize_nearest(frames[0], 12, 8))
