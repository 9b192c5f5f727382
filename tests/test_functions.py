"""Scalar + text function tests with golden values (mirrors the
reference's pure-function unit tests, SURVEY.md section 5.1)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from oregonwaterdataportal_etl_spark.functions import scalar, text


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def strcol(spark, s, fn):
    return (
        spark.createDataFrame([(s,)], ["s"]).select(fn("s").alias("v")).collect()[0]["v"]
    )


def test_deterministic_hash_golden(spark):
    """Reference golden: deterministic_hash('test', 5) == 28374
    (userCode/wrd/lib_test.py:77-102)."""
    assert strcol(spark, "test", lambda c: scalar.deterministic_hash(c, 5)) == 28374


@pytest.mark.parametrize("s", ["", "a", "hello world", "conv_00000042/t3#999", "ünïcode"])
@pytest.mark.parametrize("k", [3, 5, 9])
def test_deterministic_hash_matches_python(spark, s, k):
    expected = int(hashlib.md5(s.encode()).hexdigest(), 16) % 10**k
    expected = expected if expected != 0 else 1
    assert strcol(spark, s, lambda c: scalar.deterministic_hash(c, k)) == expected


def test_pacific_to_utc(spark):
    """Reference pins '01-15-2024 08:30' Pacific -> 16:30 UTC
    (semantics of userCode/wrd/lib.py:131-149)."""
    v = strcol(spark, "01-15-2024 08:30", scalar.parse_pacific_to_utc)
    assert v.strftime("%Y-%m-%dT%H:%M") == "2024-01-15T16:30"
    # date-only fallback format
    v2 = strcol(spark, "01-15-2024", scalar.parse_pacific_to_utc)
    assert v2.strftime("%Y-%m-%dT%H:%M") == "2024-01-15T08:00"


def test_interval_roundtrip(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-06-01 12:00:00")], ["a", "b"]
    ).select(F.to_timestamp("a").alias("a"), F.to_timestamp("b").alias("b"))
    iv = df.select(scalar.interval_build("a", "b").alias("iv"))
    assert iv.collect()[0]["iv"] == "2024-01-01T00:00:00Z/2024-06-01T12:00:00Z"
    s, e = scalar.interval_split("iv")
    back = iv.select(s.alias("s"), e.alias("e")).collect()[0]
    assert back["s"].strftime("%H:%M") == "00:00" and back["e"].strftime("%H:%M") == "12:00"


def test_synth_numeric_id(spark):
    """F5 — digits-only concat truncated to 18 (userCode/wrd/
    sta_generation.py:29-46)."""
    df = spark.createDataFrame([("stn-123", "2024-01-02T03:04:05Z")], ["a", "b"])
    v = df.select(scalar.synth_numeric_id("a", "b").alias("v")).collect()[0]["v"]
    assert v == "123202401020304" + "05"[:2]
    assert len(v) <= 18 and v.isdigit()


def test_padded_key(spark):
    df = spark.createDataFrame([("26", 1234)], ["cc", "nbr"])
    v = df.select(scalar.padded_key("cc", "nbr").alias("v")).collect()[0]["v"]
    assert v == "260001234"


def test_strip_suffix_and_unit(spark):
    assert (
        strcol(spark, "mean_daily_flow_available", lambda c: scalar.strip_suffix(c, "_available", "_avail"))
        == "mean_daily_flow"
    )
    assert strcol(spark, "instantaneous_flow_cfs", scalar.unit_from_header) == "cfs"
    assert strcol(spark, "305m", scalar.numeric_prefix) == 305


def test_coords_conditional(spark):
    df = spark.createDataFrame([(1.0, 2.0, 30), (3.0, 4.0, None)], ["lon", "lat", "el"])
    out = df.select(scalar.coords("lon", "lat", "el").alias("c")).collect()
    assert out[0]["c"] == [1.0, 2.0, 30.0]
    assert out[1]["c"] == [3.0, 4.0]


def test_token_counts(spark):
    assert strcol(spark, "the quick brown fox", text.token_count) == 4
    # don / ' / t / stop / , / it / ' / s / 4 / 2 / ! -> 11
    assert strcol(spark, "don't stop, it's 42!", text.bpe_ish_token_count) == 11


def test_detect_lang(spark):
    assert strcol(spark, "The cat and the dog is here to stay", text.detect_lang) == "en"
    assert strcol(spark, "Der Hund ist nicht da und die Katze", text.detect_lang) == "de"
    assert strcol(spark, "zzz 123", text.detect_lang) == "und"


def test_quality_score_bounds(spark):
    vals = [
        strcol(spark, s, text.quality_score)
        for s in ["short", "The cat and the dog played in the garden all day.", "!!!???!!!"]
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[1] > vals[2]


def test_fingerprints_stable(spark):
    a = strcol(spark, "hello world", text.md5_prefix_fingerprint)
    b = strcol(spark, "hello world", text.md5_prefix_fingerprint)
    expected = int(hashlib.md5(b"hello world").hexdigest()[:15], 16)
    assert a == b == expected


def test_shingles_and_ngrams(spark):
    sh = strcol(spark, "abcdef", lambda c: text.shingles(c, 3))
    assert sh == ["abc", "bcd", "cde", "def"]
    ng = strcol(spark, "a b c d", lambda c: text.word_ngrams(c, 2))
    assert ng == ["a b", "b c", "c d"]


def test_circle_polygon(spark):
    """F9 — geodesic circle polygon pandas UDF (reference:
    userCode/groundwater/lib.py:4-35). Verify ring shape, closure,
    and that every vertex is ~radius meters from the center."""
    import math

    from oregonwaterdataportal_etl_spark.functions.geo import (
        EARTH_RADIUS_M,
        FT_TO_M,
        circle_polygon,
    )

    df = spark.createDataFrame(
        [(-120.0, 44.0, 1000.0), (0.0, 0.0, 328.084)], ["lon", "lat", "radius_ft"]
    )
    rows = df.select(
        "lon", "lat", "radius_ft", circle_polygon("lon", "lat", "radius_ft").alias("ring")
    ).collect()
    for r in rows:
        ring = r["ring"]
        assert len(ring) == 13 and ring[0] == ring[-1]  # closed 12-gon
        radius_m = r["radius_ft"] * FT_TO_M
        for lon2, lat2 in ring[:-1]:
            # haversine distance back to the center
            p1, p2 = math.radians(r["lat"]), math.radians(lat2)
            dlam = math.radians(lon2 - r["lon"])
            d = math.acos(
                min(1.0, math.sin(p1) * math.sin(p2)
                    + math.cos(p1) * math.cos(p2) * math.cos(dlam))
            ) * EARTH_RADIUS_M
            assert abs(d - radius_m) < 1.0, (d, radius_m)
