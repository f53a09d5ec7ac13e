"""Sitemap-protocol ingestion: parse + bounded index recursion."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.sitemaps import (
    expand_sitemaps,
    gunzip_bytes,
    parse_sitemap,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h.example/a?x=1&amp;y=2</loc>
    <lastmod>2024-03-05T12:30:00+00:00</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://h.example/b]]></loc></url>
  <url><loc> https://h.example/c&#38;d </loc><priority>0.3</priority></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>
"""

NS_INDEX = """<?xml version="1.0"?>
<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sm:sitemap><sm:loc>https://h.example/child1.xml</sm:loc>
    <sm:lastmod>2024-02-02</sm:lastmod></sm:sitemap>
  <sm:sitemap><sm:loc>https://h.example/child2.xml</sm:loc></sm:sitemap>
</sm:sitemapindex>
"""


def _parse(spark, body, **kw):
    df = spark.createDataFrame(
        [("https://h.example/sitemap.xml", body)], "sitemap_url string, body string"
    )
    return parse_sitemap(df, **kw).orderBy("loc").collect()


def test_urlset_fields_and_entities(spark):
    rows = _parse(spark, URLSET)
    # the <url> with no <loc> is dropped, never a null row
    assert [r["loc"] for r in rows] == [
        "https://h.example/a?x=1&y=2",
        "https://h.example/b",
        "https://h.example/c&d",
    ]
    a = rows[0]
    assert a["kind"] == "url"
    assert a["changefreq"] == "daily"
    assert a["priority"] == pytest.approx(0.8)
    assert a["lastmod"] is not None and a["lastmod"].year == 2024
    assert rows[1]["priority"] is None


def test_namespaced_index(spark):
    rows = _parse(spark, NS_INDEX)
    assert [(r["kind"], r["loc"]) for r in rows] == [
        ("index", "https://h.example/child1.xml"),
        ("index", "https://h.example/child2.xml"),
    ]
    assert rows[0]["lastmod"].month == 2


def test_gunzip_passthrough_and_corrupt(spark):
    plain = URLSET.encode()
    df = spark.createDataFrame(
        [
            ("gz", bytearray(gzip.compress(plain))),
            ("plain", bytearray(plain)),
            ("corrupt", bytearray(b"\x1f\x8b not really gzip")),
            ("null", None),
        ],
        "name string, raw binary",
    )
    got = {
        r["name"]: r["out"]
        for r in df.select("name", gunzip_bytes("raw").alias("out")).collect()
    }
    assert bytes(got["gz"]) == plain and bytes(got["plain"]) == plain
    assert got["corrupt"] is None and got["null"] is None


def test_parse_has_no_exchange(spark):
    df = spark.createDataFrame(
        [("u", URLSET)], "sitemap_url string, body string"
    )
    plan = parse_sitemap(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def make_fetcher(pages):
    """fetch_batch stub over an in-memory {url: body} web. Defined in a
    function so cloudpickle ships the class BY VALUE to workers (a
    test-module top-level class is not importable there)."""

    class SitemapFixtureFetcher:
        def __init__(self, pages):
            self.pages = pages

        def fetch_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
            out = pdf.copy()
            bodies = [self.pages.get(u) for u in pdf["url"]]
            out["body"] = bodies
            out["status"] = [200 if b is not None else 404 for b in bodies]
            out["success"] = [b is not None for b in bodies]
            out["latency_ms"] = 1
            return out

    return SitemapFixtureFetcher(pages)


def _index(children):
    body = "<sitemapindex>"
    for c in children:
        body += f"<sitemap><loc>{c}</loc></sitemap>"
    return body + "</sitemapindex>"


def _urlset(urls):
    body = "<urlset>"
    for u in urls:
        body += f"<url><loc>{u}</loc><priority>0.5</priority></url>"
    return body + "</urlset>"


def test_expand_recurses_and_breaks_cycles(spark):
    root = "https://h/sitemap.xml"
    pages = {
        # root index → child index (cycle back to root) + leaf urlset
        root: _index(["https://h/idx2.xml", "https://h/leaf1.xml"]),
        "https://h/idx2.xml": _index([root, "https://h/leaf2.xml"]),
        "https://h/leaf1.xml": _urlset(["https://h/p1", "https://h/p2"]),
        "https://h/leaf2.xml": _urlset(["https://h/p2", "https://h/p3"]),
        # depth-4 sitemap that max_depth=3 must NOT reach
        "https://h/deep.xml": _urlset(["https://h/never"]),
    }
    fetcher = make_fetcher(pages)
    seeds = spark.createDataFrame([("h", root)], "host string, sitemap_url string")
    # the root↔idx2 cycle must terminate (anti-join vs seen) with no
    # duplicate page rows despite p2 appearing in both leaves
    got = expand_sitemaps(spark, seeds, fetcher, max_depth=3)
    locs = sorted(r["loc"] for r in got.collect())
    assert locs == ["https://h/p1", "https://h/p2", "https://h/p3"]
    # page rows carry host + provenance
    row = got.filter(F.col("loc") == "https://h/p3").first()
    assert row["host"] == "h" and row["sitemap_url"] == "https://h/leaf2.xml"
    assert row["priority"] == pytest.approx(0.5)


def test_expand_empty_seeds(spark):
    seeds = spark.createDataFrame([], "host string, sitemap_url string")
    got = expand_sitemaps(spark, seeds, make_fetcher({}), max_depth=2)
    assert got.count() == 0
