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


# --------------------------------------------------------------------------
# RFC 3986 reference resolution (real-web links are relative)
# --------------------------------------------------------------------------

RESOLVE_HAND = [
    # (base, ref) — expected = urllib.parse.urljoin
    ("http://h.test/a/b/c", "d"),
    ("http://h.test/a/b/c", "./d"),
    ("http://h.test/a/b/c", "../d"),
    ("http://h.test/a/b/c", "../../d"),
    ("http://h.test/a/b/c", "../../../../d"),  # over-pop → root
    ("http://h.test/a/b/c", "/x/y"),
    ("http://h.test/a/b/c", "//other.test/p"),
    ("https://h.test/a/b/c", "//other.test/p"),
    ("http://h.test/a/b/c", "http://abs.test/q"),
    ("http://h.test/a/b/c", "HTTPS://abs.test/q"),
    ("http://h.test/a/b/c", "?q=1"),
    ("http://h.test/a/b/c?old=1", "?q=1"),
    ("http://h.test/a/b/c", "#frag"),
    ("http://h.test/a/b/c", ""),
    ("http://h.test", "x"),
    ("http://h.test/", "x/y/../z"),
    ("http://h.test/a/", "b/./c/./d"),
    ("http://h.test/a/b/", "../"),
    ("http://h.test/a/b/", ".."),
    ("http://h.test/a/b/", "."),
    ("http://h.test/a/b/c", "d/e?q=2#f"),
    ("http://h.test/vn/tin-tức/bài-1", "../ảnh/x.png"),
    ("http://h.test/a/b/c", "data:image/png;base64,AAA"),
    ("http://h.test/a/b/c", "mailto:x@y.z"),
]


def _resolve_fuzz(n=300):
    rnd = random.Random(7)
    bases = [
        "http://h.test", "http://h.test/", "http://h.test/a",
        "http://h.test/a/b/c", "https://x.test/p/q/", "http://h.test/a?q=1",
    ]
    seg = ["d", "dd", "..", ".", "đ-ẫ", "x1"]
    out = []
    for _ in range(n):
        parts = [rnd.choice(seg) for _ in range(rnd.randint(1, 5))]
        ref = ("/" if rnd.random() < 0.3 else "") + "/".join(parts)
        if rnd.random() < 0.3:
            ref += rnd.choice(["?q=1", "#f", "?a=b#c"])
        out.append((rnd.choice(bases), ref))
    return out


def test_resolve_url_python_matches_urljoin():
    from urllib.parse import urljoin

    from crawler_spark.canonical import resolve_url

    for base, ref in RESOLVE_HAND + _resolve_fuzz():
        assert resolve_url(base, ref) == urljoin(base, ref), (base, ref)


def test_resolve_url_col_matches_urljoin(spark):
    """The JVM Column implementation agrees with RFC 3986 (urljoin)
    on hand cases + 300 fuzzed (base, ref) pairs including dot-segment
    ladders, over-pops, and non-ASCII path segments."""
    from urllib.parse import urljoin

    from crawler_spark.canonical import resolve_url_col

    cases = RESOLVE_HAND + _resolve_fuzz()
    df = spark.createDataFrame(
        [(i, b, r) for i, (b, r) in enumerate(cases)], "i int, b string, r string"
    )
    got = {
        row["i"]: row["res"]
        for row in df.select(
            "i", resolve_url_col(F.col("b"), F.col("r")).alias("res")
        ).collect()
    }
    for i, (b, r) in enumerate(cases):
        assert got[i] == urljoin(b, r), (b, r, got[i])


def test_absolutize_md_rewrites_only_relative_refs():
    """Fetch-boundary link normalization: relative markdown refs
    become absolute; absolute/opaque refs (and all other bytes) stay
    byte-identical."""
    from crawler_spark.canonical import absolutize_md

    base = "http://h.test/a/b/page"
    body = (
        "# T\n"
        "[abs](http://x.test/q) [rel](chap-2) [up](../up/x) [root](/r)\n"
        "![img](pics/i.png) ![dataimg](data:image/gif;base64,R0lA)\n"
        "[proto](//cdn.test/y) [mail](mailto:a@b.c) plain text"
    )
    out = absolutize_md(body, base)
    assert "[abs](http://x.test/q)" in out
    assert "[rel](http://h.test/a/b/chap-2)" in out
    assert "[up](http://h.test/a/up/x)" in out
    assert "[root](http://h.test/r)" in out
    assert "![img](http://h.test/a/b/pics/i.png)" in out
    assert "![dataimg](data:image/gif;base64,R0lA)" in out
    assert "[proto](http://cdn.test/y)" in out
    assert "[mail](mailto:a@b.c)" in out
    assert out.startswith("# T\n") and out.endswith("plain text")
    # a fully-absolute body is byte-identical (fixture worlds)
    abs_body = "[a](http://x/1) ![b](http://x/2.png)"
    assert absolutize_md(abs_body, base) == abs_body


def test_absolutize_html_attributes_and_srcset():
    """The HTML twin: href/src/lazy-load/poster and every srcset
    candidate rewrite to absolute; absolute/opaque/fragment values and
    all other bytes pass through."""
    from crawler_spark.canonical import absolutize_html

    base = "http://h.test/a/b/page"
    html = (
        '<a href="../up">u</a><img src=pics/i.png alt=x>'
        "<img data-src='/lazy.png' srcset=\"s/1.png 1x, /s/2.png 2x\">"
        '<video poster="p.jpg"></video>'
        '<a href="http://abs.test/q">abs</a><a href="#frag">f</a>'
        '<img src="data:image/gif;base64,R0lA">'
        "<p>src= in text is untouched only if not attr-shaped</p>"
    )
    out = absolutize_html(html, base)
    assert 'href="http://h.test/a/up"' in out
    assert 'src="http://h.test/a/b/pics/i.png"' in out
    assert 'data-src="http://h.test/lazy.png"' in out
    assert 'srcset="http://h.test/a/b/s/1.png 1x, http://h.test/s/2.png 2x"' in out
    assert 'poster="http://h.test/a/b/p.jpg"' in out
    assert 'href="http://abs.test/q"' in out
    assert 'href="#frag"' in out
    assert 'src="data:image/gif;base64,R0lA"' in out


def test_absolutize_html_srcset_with_data_uri_is_untouched():
    """ADVICE r4: a srcset containing a data URI must not be split at
    its base64 comma and resolved fragment-by-fragment — the attribute
    bytes stay identical when no candidate actually needs rewriting,
    and real relative candidates still rewrite around an inline one."""
    from crawler_spark.canonical import absolutize_html

    base = "http://h.test/a/b/page"
    ph = "data:image/gif;base64,R0lGODlhAQABAAAAACH5BAEKAAEALAAAAAABAAEAAAICTAEAOw=="
    html = f'<img srcset="{ph} 1x" data-srcset="{ph} 1x, http://x/r.jpg 2x">'
    assert absolutize_html(html, base) == html
    # a relative candidate NEXT TO a data URI rewrites; the data URI
    # survives byte-identical inside the rewritten attribute
    html2 = f'<img srcset="{ph} 1x, s/2.png 2x">'
    out = absolutize_html(html2, base)
    assert f'srcset="{ph} 1x, http://h.test/a/b/s/2.png 2x"' in out


def test_absolutize_md_skips_code_regions():
    """Fenced blocks and inline code spans are content: refs inside
    them pass through byte-identical; prose around them still
    rewrites."""
    from crawler_spark.canonical import absolutize_md

    base = "http://h.test/a/page"
    body = (
        "[before](x)\n"
        "```md\n[sample](rel/in-fence) ![i](p.png)\n```\n"
        "middle [mid](y) and `[inline](code-span)` end\n"
        "~~~\n[tilde](fence2)\n~~~\n"
        "[after](z)"
    )
    out = absolutize_md(body, base)
    assert "[before](http://h.test/a/x)" in out
    assert "[mid](http://h.test/a/y)" in out
    assert "[after](http://h.test/a/z)" in out
    assert "[sample](rel/in-fence)" in out and "![i](p.png)" in out
    assert "`[inline](code-span)`" in out
    assert "[tilde](fence2)" in out
    # unclosed fence protects to EOF (CommonMark)
    body2 = "[a](r)\n```\n[b](s)\n[c](t)"
    out2 = absolutize_md(body2, base)
    assert "[a](http://h.test/a/r)" in out2
    assert "[b](s)" in out2 and "[c](t)" in out2
