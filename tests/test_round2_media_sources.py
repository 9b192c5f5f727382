"""Round-2: real PNG decode path (in-tree pure-stdlib codec) and the
native (no-openpyxl) xlsx reader."""

import struct
import zipfile
import zlib

import numpy as np
import pytest

from oregonwaterdataportal_etl_spark.operators import multimodal
from oregonwaterdataportal_etl_spark.operators.pngcodec import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    luminance_histogram,
    resize_nearest,
)
from oregonwaterdataportal_etl_spark.sources.readers import read_xlsx


def _handmade_png() -> tuple[bytes, np.ndarray]:
    """A 2x2 RGB PNG built by hand (independent of encode_png):
    red, green / blue, white, filter 0 rows."""
    pixels = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = b"\x00" + pixels[0].tobytes() + b"\x00" + pixels[1].tobytes()

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    return png, pixels


def test_decode_handmade_png():
    png, pixels = _handmade_png()
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert (out == pixels).all()


def test_png_roundtrip_all_filters_content():
    rng = np.random.default_rng(5)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
        assert (decode_png(encode_png(arr)) == arr).all()


def test_png_filtered_rows_decode():
    """Exercise Sub/Up/Average/Paeth unfiltering against a reference
    encoder written inline (filters applied per PNG spec)."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int16)
    scans = b""
    for y, f in zip(range(h), (1, 2, 3, 4)):
        cur = flat[y]
        up = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        left = np.concatenate([np.zeros(ch, dtype=np.int16), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int16), up[:-ch]])
        if f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - up
        elif f == 3:
            enc = cur - (left + up) // 2
        else:
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
            enc = cur - pred
        scans += bytes([f]) + (enc % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scans)) + chunk(b"IEND", b"")
    assert (decode_png(png) == arr).all()


def test_resize_nearest_shape():
    arr = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    out = resize_nearest(arr, 4, 6)
    assert out.shape == (6, 4, 3)
    assert (out[0, 0] == arr[0, 0]).all() and (out[-1, -1] == arr[-1, -1]).all()


def test_extract_features_real_png_histogram(spark):
    """A valid PNG must produce the REAL luminance histogram, not the
    sha256 stub; invalid 'png' bytes still fall back to the stub."""
    png, pixels = _handmade_png()
    rows = [(1, "image/png", png, {}), (2, "image/png", b"\x89PNG-not-really", {})]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    expected = luminance_histogram(pixels)
    assert np.allclose(feats[1], expected)
    assert abs(sum(feats[1]) - 1.0) < 1e-6  # a real normalized histogram
    assert not np.allclose(feats[2], expected)


def test_extract_features_undecodable_png_falls_back(spark):
    """A PNG the minimal codec can't decode (valid magic, truncated
    body) must fall back to stub features, never fail the job."""
    bad = PNG_MAGIC + b"\x00\x00\x00\x0dIHDRtruncated-garbage"
    media = spark.createDataFrame(
        [(9, "image/png", bad, {})], schema=multimodal.MEDIA_SCHEMA
    )
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 32


def test_resize_images_real_png(spark):
    png, _ = _handmade_png()
    media = spark.createDataFrame([(1, "image/png", png, {})], schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(media, 8, 8).collect()
    resized = decode_png(bytes(out[0]["payload"]))
    assert resized.shape == (8, 8, 3)


# ------------------------------------------------------------------ wav
def test_wav_roundtrip_and_spectrum():
    from oregonwaterdataportal_etl_spark.operators.wavcodec import (
        decode_wav,
        encode_wav,
        log_spectrum_feature,
    )

    t = np.linspace(0, 1, 16000, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    dec, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000 and len(dec) == 16000
    assert np.abs(dec - sig).max() < 1e-3  # 16-bit quantization only
    feat = log_spectrum_feature(dec, bins=32)
    # a 440 Hz tone at 16 kHz concentrates in band floor(440/8000*32)=1
    assert int(np.argmax(feat)) == 1 and abs(feat.sum() - 1.0) < 1e-6


def test_extract_features_real_wav_spectrum(spark):
    from oregonwaterdataportal_etl_spark.operators.wavcodec import (
        encode_wav,
        log_spectrum_feature,
        decode_wav,
    )

    t = np.linspace(0, 1, 8000, endpoint=False)
    wav = encode_wav(0.4 * np.sin(2 * np.pi * 1000 * t), 8000)
    rows = [
        (1, "audio/wav", wav, {}),
        (2, "audio/wav", b"RIFF-not-really-a-wav", {}),  # stub fallback
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    expected = log_spectrum_feature(decode_wav(wav)[0], bins=32)
    assert np.allclose(feats[1], expected)
    assert not np.allclose(feats[2], expected)


# ------------------------------------------------------------------ xlsx
def _handmade_xlsx(path):
    """Two-sheet xlsx written with stdlib zipfile: shared strings,
    inline strings, numbers, booleans, and a skipped (sparse) cell."""
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    workbook = f"""<?xml version="1.0"?>
<workbook {ns} xmlns:r="{rns}"><sheets>
  <sheet name="sites" sheetId="1" r:id="rId1"/>
  <sheet name="data" sheetId="2" r:id="rId2"/>
  <sheet name="blank" sheetId="3" r:id="rId3"/>
</sheets></workbook>"""
    rels = f"""<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="{rns}/worksheet" Target="worksheets/sheet1.xml"/>
  <Relationship Id="rId2" Type="{rns}/worksheet" Target="worksheets/sheet2.xml"/>
  <Relationship Id="rId3" Type="{rns}/worksheet" Target="worksheets/sheet3.xml"/>
</Relationships>"""
    sst = f"""<?xml version="1.0"?>
<sst {ns} count="3" uniqueCount="3">
  <si><t>site_id</t></si><si><t>name</t></si><si><t>Upper Gauge</t></si>
</sst>"""
    sheet1 = f"""<?xml version="1.0"?>
<worksheet {ns}><sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2" t="str"><v>S1</v></c><c r="B2" t="s"><v>2</v></c></row>
</sheetData></worksheet>"""
    sheet2 = f"""<?xml version="1.0"?>
<worksheet {ns}><sheetData>
  <row r="1"><c r="A1" t="str"><v>site</v></c><c r="B1" t="str"><v>value</v></c>
              <c r="C1" t="str"><v>ok</v></c></row>
  <row r="2"><c r="A2" t="inlineStr"><is><t>S1</t></is></c><c r="B2"><v>12.5</v></c>
              <c r="C2" t="b"><v>1</v></c></row>
  <row r="3"><c r="A3" t="str"><v>S1</v></c><c r="C3" t="b"><v>0</v></c></row>
  <row r="4"><c r="A4" t="str"><v>S2</v></c><c r="B4" t="e"><v>#DIV/0!</v></c>
              <c r="C4" t="b"><v>1</v></c></row>
</sheetData></worksheet>"""
    sheet3 = f'<?xml version="1.0"?><worksheet {ns}><sheetData/></worksheet>'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)
        z.writestr("xl/worksheets/sheet3.xml", sheet3)


def test_read_xlsx_native(spark, tmp_path):
    # openpyxl must genuinely be absent for this container's fallback
    with pytest.raises(ImportError):
        import openpyxl  # noqa: F401
    p = str(tmp_path / "wb.xlsx")
    _handmade_xlsx(p)
    frames = read_xlsx(spark, p)
    # fully blank sheet dropped instead of breaking schema inference
    assert set(frames) == {"sites", "data"}
    sites = frames["sites"].collect()
    assert sites[0]["site_id"] == "S1" and sites[0]["name"] == "Upper Gauge"
    data = {r["site"]: r for r in frames["data"].collect() if r["value"] == 12.5}
    assert data["S1"]["ok"] is True
    rows = frames["data"].collect()
    assert len(rows) == 3
    # error cell (#DIV/0!) -> null, not a crash
    s2 = [r for r in rows if r["site"] == "S2"][0]
    assert s2["value"] is None and s2["ok"] is True
    only = read_xlsx(spark, p, sheets=["data"])
    assert set(only) == {"data"}
