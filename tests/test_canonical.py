"""Canonicalizer spec: Python mirror ↔ Column expression byte-parity
(the frontier dedup key depends on it), on hand cases + 500 seeded
random URL shapes."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawler_spark.canonical import canonical_url_col, canonicalize, host_col, host_of

HAND_CASES = [
    "http://example.com",
    "  http://example.com/path  ",
    "HTTP://EXAMPLE.COM/Path/Stays",
    "https://Example.com:443/x",
    "http://example.com:80/x",
    "http://example.com:8080/x",
    "example.com/no/scheme",
    "http://example.com/a//b///c",
    "http://example.com/a/b/",
    "http://example.com/",
    "http://example.com/a?q=1&r=2",
    "http://example.com/a?",
    "http://example.com/a#frag",
    "http://example.com/a#frag#two",
    "http://example.com/a?q=UPPER&Case=Kept",
    "http://example.com/ĐườngDẫn/tiếng-việt",
    "ftp://files.example.com:21/x/",
    "http://example.com?query-no-path",
    "http://example.com/a//b/?x=//y//z",
    "https://site0.test/private/doc/3",
    # opaque schemes: identity (case-significant payloads, no host)
    "data:image/png;base64,iVBORw0KGgoAAAANSUhEUg==",
    "  data:image/svg+xml,%3Csvg%20width%3D%229%22%3E  ",
    "DATA:text/plain,Hello#NotAFragment",
    "mailto:Someone@Example.COM",
    "about:blank",
    "javascript:void(0)",
]


def _random_urls(n: int = 500) -> list[str]:
    rnd = random.Random(42)
    schemes = ["http://", "https://", "HTTP://", "", "ftp://"]
    hosts = ["Example.com", "site0.test", "a.b.c.d", "xn--vit-9db.vn"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b", "/a//b", "/a/b/", "//x", "/Đường/dẫn"]
    queries = ["", "?", "?q=1", "?q=1&R=2"]
    frags = ["", "#f", "#f#g"]
    pads = ["", " ", "  "]
    out = []
    for _ in range(n):
        out.append(
            rnd.choice(pads)
            + rnd.choice(schemes)
            + rnd.choice(hosts)
            + rnd.choice(ports)
            + rnd.choice(paths)
            + rnd.choice(queries)
            + rnd.choice(frags)
            + rnd.choice(pads)
        )
    return out


def test_canonicalize_spec_hand_cases():
    assert canonicalize("HTTP://EXAMPLE.COM:80/A//b/?#f") == "http://example.com/A/b"
    assert canonicalize("example.com") == "http://example.com"
    assert canonicalize("https://X.com:443/") == "https://x.com/"
    assert canonicalize("http://a.com/p/") == "http://a.com/p"
    assert canonicalize("http://a.com/p?") == "http://a.com/p"
    assert host_of("HTTPS://A.B.C:443/x") == "a.b.c"


def test_column_python_parity(spark):
    urls = HAND_CASES + _random_urls()
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, u string")
    rows = df.select(
        "i",
        "u",
        canonical_url_col(F.col("u")).alias("canon"),
        host_col(canonical_url_col(F.col("u"))).alias("host"),
    ).collect()
    for r in rows:
        assert r["canon"] == canonicalize(r["u"]), (r["i"], repr(r["u"]))
        assert r["host"] == host_of(r["u"]), (r["i"], repr(r["u"]))


def test_idempotent():
    for u in HAND_CASES + _random_urls(200):
        c = canonicalize(u)
        assert canonicalize(c) == c, repr(u)
