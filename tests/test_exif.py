"""EXIF over JPEG APP1 (TIFF 6.0 IFDs): write→parse round-trip, the 8
orientation transforms, GPS scrub by allowlist reconstruction, and the
Spark pipeline stages (extract / scrub / orient). Encoder-twin
fixtures throughout — planted ground truth, offline-verifiable."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import exif as ex
from crawler_spark.functions import images as im


def _jpeg(seed=3, shape=(24, 40, 3)) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    return im.encode_image(arr, "jpg"), arr


# ---------------------------------------------------------------------------
# parse / build round-trip
# ---------------------------------------------------------------------------


def test_roundtrip_all_fields():
    jpg, _ = _jpeg()
    out = ex.insert_exif(
        jpg,
        orientation=6,
        make="SparkCam",
        model="SC-100",
        datetime="2026:08:19 10:00:00",
        datetime_original="2026:08:18 09:30:00",
        pixel_x=40,
        pixel_y=24,
        gps=(10.7626, 106.6602),  # reference corpus geography (HCMC)
    )
    f = ex.exif_fields(out)
    assert f is not None and f["has_gps"]
    assert f["orientation"] == 6
    assert f["make"] == "SparkCam" and f["model"] == "SC-100"
    assert f["datetime"] == "2026:08:19 10:00:00"
    assert f["datetime_original"] == "2026:08:18 09:30:00"
    assert f["pixel_x"] == 40 and f["pixel_y"] == 24
    assert abs(f["gps_lat"] - 10.7626) < 1e-6
    assert abs(f["gps_lon"] - 106.6602) < 1e-6
    # southern/western hemisphere refs
    f2 = ex.exif_fields(ex.insert_exif(jpg, gps=(-33.8688, -151.2093)))
    assert f2["gps_lat"] < 0 and abs(f2["gps_lat"] + 33.8688) < 1e-6
    assert f2["gps_lon"] < 0 and abs(f2["gps_lon"] + 151.2093) < 1e-6


def test_no_exif_returns_none_and_passthrough():
    jpg, _ = _jpeg()
    assert ex.exif_fields(jpg) is None
    scrubbed, had = ex.strip_gps(jpg)
    assert scrubbed == jpg and not had


def test_big_endian_mm_parse():
    # hand-built MM TIFF: IFD0 with just Orientation=8
    tiff = b"MM\x00\x2a" + struct.pack(">I", 8)
    tiff += struct.pack(">H", 1)
    tiff += struct.pack(">HHI", ex.TAG_ORIENTATION, 3, 1) + struct.pack(">HH", 8, 0)
    tiff += struct.pack(">I", 0)
    f = ex.parse_tiff_exif(tiff)
    assert f["orientation"] == 8 and not f["has_gps"]


def test_corrupt_ifd_raises():
    tiff = b"II*\x00" + struct.pack("<I", 9999)  # IFD offset past end
    with pytest.raises(ValueError):
        ex.parse_tiff_exif(tiff)
    with pytest.raises(ValueError):
        ex.parse_tiff_exif(b"XX*\x00\x00\x00\x00\x00")


def test_non_exif_app1_skipped():
    jpg, _ = _jpeg()
    xmp = b"\xff\xe1" + struct.pack(">H", 2 + 10) + b"http://ns\x00"
    with_xmp = jpg[:2] + xmp + jpg[2:]
    assert ex.exif_fields(with_xmp) is None  # XMP APP1 is not Exif
    f = ex.exif_fields(ex.insert_exif(with_xmp, orientation=3))
    assert f["orientation"] == 3


# ---------------------------------------------------------------------------
# GPS scrub
# ---------------------------------------------------------------------------


def test_strip_gps_keeps_safe_tags_and_pixels():
    jpg, _ = _jpeg(seed=5)
    tagged = ex.insert_exif(
        jpg, orientation=6, make="SparkCam", datetime_original="2026:01:01 00:00:00",
        gps=(21.0285, 105.8542),
    )
    scrubbed, had = ex.strip_gps(tagged)
    assert had
    f = ex.exif_fields(scrubbed)
    assert not f["has_gps"] and f["gps_lat"] is None
    assert f["orientation"] == 6 and f["make"] == "SparkCam"
    assert f["datetime_original"] == "2026:01:01 00:00:00"
    # entropy data untouched: decoded pixels byte-equal
    assert np.array_equal(
        im.decode_image(tagged, "jpg"), im.decode_image(scrubbed, "jpg")
    )
    # idempotent
    again, had2 = ex.strip_gps(scrubbed)
    assert not had2 and again == scrubbed


def test_strip_gps_drops_unknown_tags():
    """Allowlist reconstruction: a MakerNote (where vendors hide
    coordinates) must not survive the scrub even though the parser
    doesn't understand it."""
    jpg, _ = _jpeg(seed=6)
    # hand-built II TIFF: IFD0 = Orientation=3, GPS-IFD ptr, MakerNote
    ifd0_at = 8
    gps_at = ifd0_at + 2 + 3 * 12 + 4  # 3 entries, then empty GPS IFD
    tiff = b"II*\x00" + struct.pack("<I", ifd0_at)
    tiff += struct.pack("<H", 3)
    tiff += struct.pack("<HHI", ex.TAG_ORIENTATION, 3, 1) + struct.pack("<HH", 3, 0)
    tiff += struct.pack("<HHI", ex.TAG_GPS_IFD, 4, 1) + struct.pack("<I", gps_at)
    tiff += struct.pack("<HHI", 0x927C, 7, 4) + b"SECR"  # MakerNote
    tiff += struct.pack("<I", 0)  # next IFD
    tiff += struct.pack("<H", 0) + struct.pack("<I", 0)  # empty GPS IFD
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    tagged = jpg[:2] + app1 + jpg[2:]

    f = ex.exif_fields(tagged)
    assert f["has_gps"] and f["orientation"] == 3
    scrubbed, had = ex.strip_gps(tagged)
    assert had
    f2 = ex.exif_fields(scrubbed)
    assert not f2["has_gps"] and f2["orientation"] == 3
    assert b"SECR" not in scrubbed  # maker note gone


# ---------------------------------------------------------------------------
# orientation transforms
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_orientation_inverse_property(o):
    rng = np.random.default_rng(40 + o)
    arr = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)  # asymmetric
    camera = ex.inverse_orient(arr, o)
    assert np.array_equal(ex.auto_orient(camera, o), arr)
    if o in (5, 6, 7, 8):  # transposing orientations swap dims
        assert camera.shape[:2] == (14, 10)


def test_auto_orient_unknown_is_identity():
    arr = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(ex.auto_orient(arr, 0), arr)
    assert np.array_equal(ex.auto_orient(arr, 9), arr)


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def exif_images(spark):
    jpg_plain, _ = _jpeg(seed=8)
    jpg_gps = ex.insert_exif(
        _jpeg(seed=9)[0], orientation=6, make="SparkCam",
        datetime_original="2026:02:02 02:02:02", gps=(16.0544, 108.2022),
    )
    png = im.encode_image(
        np.random.default_rng(10).integers(0, 256, (8, 8, 3), dtype=np.uint8), "png"
    )
    bad = ex.insert_exif(jpg_plain, orientation=3)
    # corrupt the TIFF block in place (keep marker walk valid)
    s, e, _ = ex._find_app1_exif(bad)
    bad = bad[: s + 10] + b"II*\x00\xff\xff\xff\xff" + bad[s + 18 : ]
    rows = [
        ("plain", jpg_plain, "jpg"),
        ("gps", jpg_gps, "jpg"),
        ("png", png, "png"),
        ("corrupt", bad, "jpg"),
    ]
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def test_extract_exif_stage(spark, exif_images):
    from crawler_spark.operators.images_pipeline import extract_exif

    got = {r["image_id"]: r for r in extract_exif(exif_images).collect()}
    assert not got["plain"]["has_exif"] and got["plain"]["exif_ok"]
    g = got["gps"]
    assert g["has_gps"] and g["orientation"] == 6 and g["make"] == "SparkCam"
    assert abs(g["gps_lat"] - 16.0544) < 1e-6
    assert not got["png"]["has_exif"]
    assert not got["corrupt"]["exif_ok"]  # quarantine, not stage failure


def test_scrub_image_pii_stage(spark, exif_images):
    from crawler_spark.operators.images_pipeline import scrub_image_pii

    got = {r["image_id"]: r for r in scrub_image_pii(exif_images).collect()}
    assert got["gps"]["had_gps"]
    f = ex.exif_fields(bytes(got["gps"]["bytes"]))
    assert not f["has_gps"] and f["orientation"] == 6
    assert not got["plain"]["had_gps"]
    assert bytes(got["png"]["bytes"])[:8] == b"\x89PNG\r\n\x1a\n"  # passthrough


def test_orient_images_stage(spark, exif_images):
    from crawler_spark.operators.images_pipeline import orient_images

    got = {r["image_id"]: r for r in orient_images(exif_images).collect()}
    g = got["gps"]  # 24x40 source, orientation 6 ⇒ display 40x24
    assert g["orient_ok"] and g["orientation"] == 6
    assert (g["w"], g["h"]) == (24, 40)
    p = got["plain"]
    assert p["orient_ok"] and (p["w"], p["h"]) == (40, 24)
    # display-space phash equals phash of the auto-oriented pixels
    raw = bytes(
        exif_images.where(F.col("image_id") == "gps").collect()[0]["bytes"]
    )
    arr = ex.auto_orient(im.decode_image(raw, "jpg"), 6)
    assert g["phash"] == im.phash64(arr)


# ---------------------------------------------------------------------------
# composition: orientation-normalized near-dup (orient_images feeds the
# banded pHash operator — rotated re-posts of one photo must cluster)
# ---------------------------------------------------------------------------


def test_orientation_invariant_near_dup(spark):
    from crawler_spark.operators.images_pipeline import (
        near_duplicate_images,
        orient_images,
    )

    rng = np.random.default_rng(77)
    base = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    upright = im.encode_image(base, "jpg")
    # the same photo stored rotated 90° CW with orientation 8 — i.e.
    # camera wrote rotated pixels and tagged how to display them back
    rotated = ex.insert_exif(
        im.encode_image(ex.inverse_orient(base, 8), "jpg"), orientation=8
    )
    other = im.encode_image(
        rng.integers(0, 256, (32, 48, 3), dtype=np.uint8), "jpg"
    )
    df = spark.createDataFrame(
        [("up", upright, "jpg"), ("rot", rotated, "jpg"), ("oth", other, "jpg")],
        "image_id string, bytes binary, fmt string",
    )
    oriented = orient_images(df)
    pairs = near_duplicate_images(
        oriented.select("image_id", "phash"), max_hamming=7
    )
    got = {tuple(sorted((r["id_a"], r["id_b"]))) for r in pairs.collect()}
    assert ("rot", "up") in got
    assert all("oth" not in p for p in got)
