"""Compressed-audio WAV decode (wavcodec.py round-5 additions):
G.711 mu-law/A-law, IEEE float, mono IMA ADPCM."""

import struct

import numpy as np

from oregonwaterdataportal_etl_spark.operators.wavcodec import (
    alaw_decode_bytes,
    alaw_encode_samples,
    decode_wav,
    encode_wav_g711,
    encode_wav_ima,
    ima_adpcm_decode,
    mulaw_decode_bytes,
    mulaw_encode_samples,
    wav_info,
    _build_wav,
)


def _sine(n=4000, rate=8000, hz=440.0):
    t = np.arange(n) / rate
    return 0.6 * np.sin(2 * np.pi * hz * t)


def _snr_db(ref, got):
    n = min(len(ref), len(got))
    ref, got = ref[:n], got[:n]
    noise = ref - got
    return 10 * np.log10((ref ** 2).sum() / max((noise ** 2).sum(), 1e-30))


def test_g711_known_values():
    # ITU-T G.711 anchor points
    assert mulaw_decode_bytes(b"\xff")[0] == 0          # mu-law code 0xFF = 0
    assert mulaw_encode_samples(np.array([0], dtype=np.int16)) == b"\xff"
    assert alaw_decode_bytes(b"\x55")[0] == 8           # A-law code 0x55 = +8
    assert alaw_decode_bytes(b"\xd5")[0] == -8
    # extreme magnitudes: complementary coding puts the most negative
    # value at code 0x00 and the most positive at 0x80
    assert mulaw_decode_bytes(b"\x80")[0] == 32124
    assert mulaw_decode_bytes(b"\x00")[0] == -32124


def test_g711_decode_encode_idempotent():
    """decode(encode(x)) is a fixed point: re-encoding the decoded
    samples reproduces the same bytes for every possible code."""
    all_codes = bytes(range(256))
    for dec, enc in (
        (mulaw_decode_bytes, mulaw_encode_samples),
        (alaw_decode_bytes, alaw_encode_samples),
    ):
        decoded = dec(all_codes)
        recoded = enc(decoded)
        redecoded = dec(recoded)
        assert np.array_equal(decoded, redecoded), dec.__name__


def test_g711_wav_roundtrip_snr():
    x = _sine()
    for law in ("mulaw", "alaw"):
        payload = encode_wav_g711(x, rate=8000, law=law)
        got, rate = decode_wav(payload)
        assert rate == 8000
        assert _snr_db(x, got) > 30, law  # 8-bit log companding ~35-38 dB
        info = wav_info(payload)
        assert info["sample_rate"] == 8000 and info["n_frames"] == len(x)


def test_ima_adpcm_hand_block():
    """Hand-built single block: predictor 100, index 0, nibbles 0x1
    then 0x9 — stepped through the published IMA tables by hand."""
    # step[0]=7: nibble 1 -> diff = 7>>3 + 7>>2 = 0+1 = 1 -> pred 101, idx 0->max(0,-1)=0... 
    # nibble 1 index delta -1 -> stays 0; nibble 9 (sign|1) -> diff 1 -> pred 100
    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x91])  # lo=1, hi=9
    out = ima_adpcm_decode(block, block_align=len(block))
    assert list(out) == [100, 101, 100]


def test_ima_adpcm_wav_roundtrip_snr():
    x = _sine(n=3000)
    payload = encode_wav_ima(x, rate=8000)
    got, rate = decode_wav(payload)
    assert rate == 8000
    assert _snr_db(x, got) > 20  # 4-bit predictive coding on a smooth tone
    info = wav_info(payload)
    assert info["sample_rate"] == 8000
    assert info["n_frames"] >= len(x)


def test_float_wav_decode():
    x = _sine(n=500).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    payload = _build_wav(fmt, x.tobytes())
    got, rate = decode_wav(payload)
    assert rate == 16000
    np.testing.assert_allclose(got, x.astype(np.float64), atol=1e-7)


def test_multimodal_features_decode_g711(spark):
    """The multimodal layer now really decodes G.711 payloads:
    decoded=true and a real spectrum feature."""
    from oregonwaterdataportal_etl_spark.operators.multimodal import (
        extract_features,
    )

    from oregonwaterdataportal_etl_spark.operators import multimodal

    payload = encode_wav_g711(_sine(), rate=8000)
    df = spark.createDataFrame(
        [(1, "audio/wav", payload, {})], schema=multimodal.MEDIA_SCHEMA
    )
    row = extract_features(df).collect()[0]
    assert row["decoded"] is True
    assert row["feature"] is not None and len(row["feature"]) == 32
