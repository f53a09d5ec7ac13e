"""Content sniffing + inline data-URI ingestion.

The real web lies about image formats (a .jpg URL serving PNG bytes is
routine) and ships small logos INSIDE the HTML as RFC 2397 data URIs.
The reference never faces either (it drops all images,
src/lib/md/mdUtils.ts:23-44); the graft's byte-store trusts magic
bytes over labels, and substantive inline images are ingested with no
fetch stage at all — while 1-px lazy-loader trackers stay out of the
corpus (functions/html.py placeholder rule)."""

from __future__ import annotations

import base64

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import images as im
from crawler_spark.functions.html import (
    html_to_md,
    parse_data_uri,
    substantive_data_uri,
)

ONE_PX_GIF = (
    "data:image/gif;base64,"
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def _png_uri(w=16, h=16, color=(200, 30, 90)):
    arr = np.full((h, w, 3), color, np.uint8)
    data = im.encode_image(arr, "png")
    return "data:image/png;base64," + base64.b64encode(data).decode(), data, arr


# --------------------------------------------------------------------------
# sniffing + header probes
# --------------------------------------------------------------------------


def test_sniff_and_probe_all_registry_formats():
    """Every codec's output sniffs back to its own key and probes its
    exact dimensions from the HEADER alone — no pixel decode."""
    rng = np.random.default_rng(0)
    arr = (rng.integers(0, 4, (24, 17, 3)) * 80).astype(np.uint8)
    for fmt in im.CODECS:
        a = arr if fmt != "gif" else (arr // 64 * 64)
        data = im.encode_image(a, fmt)
        assert im.sniff_format(data) == fmt
        assert im.probe_image(data) == (fmt, 17, 24), fmt


def test_sniff_rejects_non_images():
    for junk in (b"", b"hello world", b"<html><body/></html>",
                 b"\x89PN", b"RIFFxxxxWAVE", b"P7\n"):
        assert im.sniff_format(junk) is None
        assert im.probe_image(junk) is None


def test_sniff_svg_through_prolog():
    doc = (b"\xef\xbb\xbf<?xml version='1.0'?>\n<!-- logo -->\n"
           b"<!DOCTYPE svg>\n  <svg xmlns='x' width='9' height='7'/>")
    assert im.sniff_format(doc) == "svg"
    assert im.probe_image(doc) == ("svg", 9, 7)
    # <svgfoo> is not an svg root
    assert im.sniff_format(b"<svgfoo width='9'/>") is None


def test_probe_never_decodes_pixels():
    """A JPEG with a valid header but truncated entropy data still
    probes (headers are intact) — proof the probe is header-only."""
    arr = np.full((24, 17, 3), 99, np.uint8)
    data = im.encode_image(arr, "jpg")
    truncated = data[: len(data) // 2]
    assert im.probe_image(truncated) == ("jpg", 17, 24)
    with pytest.raises(Exception):
        im.decode_image(truncated, "jpg")


def test_decode_image_auto_routes_by_bytes():
    arr = np.full((8, 8, 3), (10, 200, 30), np.uint8)
    data = im.encode_image(arr, "png")
    fmt, out = im.decode_image_auto(data)
    assert fmt == "png" and np.array_equal(out, arr)
    with pytest.raises(ValueError):
        im.decode_image_auto(b"not an image")


# --------------------------------------------------------------------------
# data URIs
# --------------------------------------------------------------------------


def test_parse_data_uri_base64_and_percent():
    uri, data, _ = _png_uri()
    assert parse_data_uri(uri) == ("image/png", data)
    # missing padding tolerated (browser behavior)
    assert parse_data_uri(uri.rstrip("=")) == ("image/png", data)
    # percent-encoded text form
    from urllib.parse import quote

    svg = b'<svg xmlns="x" width="5" height="5"/>'
    assert parse_data_uri("data:image/svg+xml," + quote(svg)) == (
        "image/svg+xml",
        svg,
    )
    # charset params don't confuse the mediatype
    assert parse_data_uri("data:text/plain;charset=utf-8,hi") == (
        "text/plain",
        b"hi",
    )
    assert parse_data_uri("data:image/png;base64,@@@") is None
    assert parse_data_uri("http://x/y.png") is None


def test_substantive_floor_is_bytes_not_label():
    uri, _, _ = _png_uri(16, 16)
    assert substantive_data_uri(uri)
    assert not substantive_data_uri(ONE_PX_GIF)
    # 2×2 tracker: still noise; 3×3: content
    for n, want in ((2, False), (3, True)):
        arr = np.full((n, n, 3), 5, np.uint8)
        u = "data:image/png;base64," + base64.b64encode(
            im.encode_image(arr, "png")
        ).decode()
        assert substantive_data_uri(u) is want
    # label says png, payload is text → noise regardless of label
    assert not substantive_data_uri("data:image/png;base64,aGVsbG8=")


def test_html_keeps_substantive_inline_drops_tracker():
    uri, _, _ = _png_uri()
    md = html_to_md(
        f'<p>x</p><img src="{uri}" alt="logo"/>'
        f'<img src="{ONE_PX_GIF}" alt="spacer"/>'
    )
    assert f"![logo]({uri})" in md
    assert ONE_PX_GIF not in md and "spacer" in md
    # lazy loader: placeholder src + real data-src still prefers the URL
    md2 = html_to_md(f'<img src="{ONE_PX_GIF}" data-src="http://cdn/x.png" alt="a"/>')
    assert "![a](http://cdn/x.png)" in md2


# --------------------------------------------------------------------------
# Spark: ingestion + format-lie correction
# --------------------------------------------------------------------------


def _extractions(spark, rows):
    return spark.createDataFrame(
        rows, "page_url string, caption string, img_url string, img_order int, round int"
    )


def test_ingest_data_uris_dedupes_by_content(spark):
    from crawler_spark.operators.images_pipeline import ingest_data_uris

    uri, data, _ = _png_uri()
    ext = _extractions(
        spark,
        [
            ("http://a/1", "logo", uri, 1, 0),
            ("http://a/2", "logo again", uri, 1, 0),  # same URI, 2 pages
            ("http://a/3", "junk", "data:image/png;base64,@@@", 1, 0),
            ("http://a/4", "cdn", "http://cdn/x.png", 1, 0),
        ],
    )
    rows = ingest_data_uris(ext).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == uri and r["fmt"] == "png" and bytes(r["bytes"]) == data
    assert r["image_id"].startswith("duri")


def test_images_table_data_uri_and_fmt_lie(spark):
    """End-to-end: a data-URI row joins its caption, and a CDN row
    whose DECLARED fmt lies (jpg label, png bytes) decodes via magic
    bytes with the TRUE format recorded."""
    from crawler_spark.operators.images_pipeline import (
        build_images_table,
        ingest_data_uris,
    )

    uri, _, arr = _png_uri()
    png_bytes = im.encode_image(np.full((12, 10, 3), 7, np.uint8), "png")
    ext = _extractions(
        spark,
        [
            ("http://a/1", "inline logo", uri, 1, 0),
            ("http://a/1", "liar", "http://cdn/photo.jpg", 2, 0),
        ],
    )
    cdn = spark.createDataFrame(
        [("http://cdn/photo.jpg", "cdn1", png_bytes, "jpg")],
        "url string, image_id string, bytes binary, fmt string",
    )
    store = cdn.unionByName(ingest_data_uris(ext))
    out = {r["caption"]: r for r in build_images_table(ext, store).collect()}
    inline = out["inline logo"]
    assert inline["decode_ok"] and inline["fmt"] == "png"
    assert (inline["w"], inline["h"]) == (16, 16)
    assert inline["phash"] == im.phash64(arr)
    liar = out["liar"]
    assert liar["decode_ok"] and liar["fmt"] == "png"
    assert (liar["w"], liar["h"]) == (10, 12)


def test_decode_bomb_quarantined_before_decode(spark):
    """A 33-byte payload whose header claims 60000×60000 (≈10 GB
    decoded) quarantines via the header probe — the decoder never
    runs. A normal row in the same batch decodes fine."""
    import struct
    import zlib

    from crawler_spark.operators.images_pipeline import build_images_table

    ihdr = struct.pack(">II5B", 60000, 60000, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    assert im.probe_image(bomb) == ("png", 60000, 60000)
    good = im.encode_image(np.full((6, 5, 3), 9, np.uint8), "png")
    ext = _extractions(
        spark,
        [
            ("http://a/1", "bomb", "http://cdn/bomb.png", 1, 0),
            ("http://a/1", "good", "http://cdn/good.png", 2, 0),
        ],
    )
    store = spark.createDataFrame(
        [
            ("http://cdn/bomb.png", "b1", bomb, "png"),
            ("http://cdn/good.png", "g1", good, "png"),
        ],
        "url string, image_id string, bytes binary, fmt string",
    )
    out = {r["caption"]: r for r in build_images_table(ext, store).collect()}
    assert not out["bomb"]["decode_ok"] and out["bomb"]["fmt"] == "png"
    assert out["good"]["decode_ok"] and (out["good"]["w"], out["good"]["h"]) == (5, 6)
