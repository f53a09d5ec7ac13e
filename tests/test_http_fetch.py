"""HttpFetcher against a loopback http.server (VERDICT r2 #6).

No external network: a threaded stdlib server on 127.0.0.1 serves the
retry/timeout/redirect matrix, and the fetcher runs both directly and
through the real ``fetch_scheduled`` applyInPandas path (local-mode
Python workers reach loopback over TCP). Semantics under test mirror
the reference's async-retry budget (getPageContent.ts:45-52): 5xx and
timeouts retry with backoff, 4xx is permanent, redirects are followed.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from crawler_spark.sources.fetch import FixtureFetcher, HttpFetcher, fetch_scheduled

HITS: dict[str, int] = defaultdict(int)
HITS_LOCK = threading.Lock()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # keep test output quiet
        pass

    def do_GET(self):
        with HITS_LOCK:
            HITS[self.path] += 1
            n = HITS[self.path]
        if self.path == "/ok":
            body = b"hello loopback"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/missing":
            self.send_error(404)
        elif self.path == "/flaky":
            # 503 twice, then 200 — the FixtureFetcher fail_rounds=2 twin
            if n <= 2:
                self.send_error(503)
            else:
                body = b"finally up"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        elif self.path == "/always503":
            self.send_error(503)
        elif self.path == "/slow":
            import time

            time.sleep(1.5)  # > fetcher timeout → client-side timeout
            self.send_response(200)
            self.end_headers()
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.end_headers()
        elif self.path == "/chain1":
            self.send_response(301)
            self.send_header("Location", "/chain2")
            self.end_headers()
        elif self.path == "/chain2":
            # RELATIVE Location — must resolve against the current URL
            self.send_response(302)
            self.send_header("Location", "ok")
            self.end_headers()
        elif self.path in ("/loop1", "/loop2"):
            self.send_response(302)
            self.send_header(
                "Location", "/loop2" if self.path == "/loop1" else "/loop1"
            )
            self.end_headers()
        elif self.path == "/etag":
            if self.headers.get("If-None-Match") == '"v1"':
                self.send_response(304)
                self.end_headers()
            else:
                body = b"versioned body"
                self.send_response(200)
                self.send_header("ETag", '"v1"')
                self.send_header("Last-Modified", "Tue, 01 Jan 2030 00:00:00 GMT")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        elif self.path == "/gzip":
            import zlib

            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            body = co.compress("nội dung nén".encode()) + co.flush()
            self.send_response(200)
            self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/deflate":
            import zlib

            body = zlib.compress(b"deflated body")
            self.send_response(200)
            self.send_header("Content-Encoding", "deflate")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/latin1":
            body = "café señor".encode("latin-1")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=ISO-8859-1")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/brotli":
            # an encoding the client never offered and can't decode
            body = b"\x00\x01\x02garbage"
            self.send_response(200)
            self.send_header("Content-Encoding", "br")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/robots-header":
            body = b"<html><body>scoped</body></html>"
            self.send_response(200)
            # split across two header lines (CDN + origin layering):
            # the client must union ALL X-Robots-Tag instances
            self.send_header("X-Robots-Tag", "noindex")
            self.send_header("X-Robots-Tag", "nofollow")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/robots-meta":
            body = (
                b'<html><head><meta name="robots" content="nofollow">'
                b'<link rel="canonical" href="http://canon.test/page">'
                b'<base href="/deep/dir/">'
                b'<meta property="og:image" content="http://canon.test/hero.jpg">'
                b'<meta property="og:image:alt" content="hero alt">'
                b"</head><body>x</body></html>"
            )
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/huge":
            body = b"x" * 3000
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(500)


@pytest.fixture()
def server():
    HITS.clear()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_fetcher_matrix(server):
    f = HttpFetcher(timeout_s=0.4, retries=5, backoff_s=0.01)
    pdf = pd.DataFrame(
        {
            "url": [
                f"{server}/ok",
                f"{server}/missing",
                f"{server}/flaky",
                f"{server}/always503",
                f"{server}/slow",
                f"{server}/redirect",
            ],
            "attempt": [1] * 6,
        }
    )
    out = f.fetch_batch(pdf).set_index("url")

    ok = out.loc[f"{server}/ok"]
    assert (ok["status"], ok["success"], ok["body"]) == (200, True, "hello loopback")

    missing = out.loc[f"{server}/missing"]
    assert (missing["status"], missing["success"]) == (404, False)
    assert HITS["/missing"] == 1  # 4xx is permanent — no retry burned

    flaky = out.loc[f"{server}/flaky"]
    assert (flaky["status"], flaky["success"], flaky["body"]) == (
        200,
        True,
        "finally up",
    )
    assert HITS["/flaky"] == 3  # two 503s + the success

    always = out.loc[f"{server}/always503"]
    assert (always["status"], always["success"]) == (503, False)
    assert HITS["/always503"] == 5  # full retry budget

    slow = out.loc[f"{server}/slow"]
    assert (slow["status"], slow["success"]) == (599, False)

    red = out.loc[f"{server}/redirect"]
    assert (red["status"], red["success"], red["body"]) == (
        200,
        True,
        "hello loopback",
    )
    assert HITS["/ok"] >= 2  # redirect followed to /ok


def test_http_fetcher_redirect_chains(server):
    """Redirect chains are followed manually: final_url + hop count
    surfaced, relative Location resolved, loops and hop caps fail loud
    instead of spinning."""
    f = HttpFetcher(timeout_s=2.0, retries=2, backoff_s=0.01)
    pdf = pd.DataFrame(
        {
            "url": [
                f"{server}/chain1",
                f"{server}/loop1",
                f"{server}/ok",
            ],
            "attempt": [1] * 3,
        }
    )
    out = f.fetch_batch(pdf).set_index("url")
    ch = out.loc[f"{server}/chain1"]
    assert (ch["status"], ch["success"], ch["body"]) == (200, True, "hello loopback")
    assert ch["final_url"] == f"{server}/ok" and ch["redirects"] == 2
    lp = out.loc[f"{server}/loop1"]
    assert (lp["status"], lp["success"]) == (302, False)
    assert HITS["/loop1"] + HITS["/loop2"] <= 2 * f.retries + 2  # no spin
    ok = out.loc[f"{server}/ok"]
    assert ok["final_url"] == f"{server}/ok" and ok["redirects"] == 0

    capped = HttpFetcher(timeout_s=2.0, retries=1, backoff_s=0.01, max_redirects=1)
    got = capped.fetch_batch(
        pd.DataFrame({"url": [f"{server}/chain1"], "attempt": [1]})
    ).iloc[0]
    assert not got["success"] and got["status"] == 302
    assert got["redirects"] == 1  # stopped at the cap, chain surfaced


def test_http_fetcher_conditional_get(server):
    """First fetch captures validators; refetch with them → 304
    not_modified (success, no body); refetch without → full body."""
    f = HttpFetcher(timeout_s=2.0, retries=2, backoff_s=0.01)
    first = f.fetch_batch(
        pd.DataFrame({"url": [f"{server}/etag"], "attempt": [1]})
    ).iloc[0]
    assert (first["status"], first["body"]) == (200, "versioned body")
    assert first["etag"] == '"v1"'
    assert first["last_modified"] == "Tue, 01 Jan 2030 00:00:00 GMT"
    assert not first["not_modified"]

    again = f.fetch_batch(
        pd.DataFrame(
            {
                "url": [f"{server}/etag"],
                "attempt": [1],
                "etag": [first["etag"]],
                "last_modified": [first["last_modified"]],
            }
        )
    ).iloc[0]
    assert (again["status"], again["success"]) == (304, True)
    assert again["not_modified"] and again["body"] is None

    fresh = f.fetch_batch(
        pd.DataFrame(
            {
                "url": [f"{server}/etag"],
                "attempt": [1],
                "etag": [None],
                "last_modified": [None],
            }
        )
    ).iloc[0]
    assert fresh["status"] == 200 and fresh["body"] == "versioned body"


def test_http_fetcher_content_encodings(server):
    """gzip/deflate responses decode (Accept-Encoding negotiated),
    charsets are honored, never-offered encodings fail loud, and
    oversized bodies hit the bomb guard."""
    f = HttpFetcher(timeout_s=2.0, retries=2, backoff_s=0.01, max_bytes=2048)
    pdf = pd.DataFrame(
        {
            "url": [
                f"{server}/gzip",
                f"{server}/deflate",
                f"{server}/latin1",
                f"{server}/brotli",
                f"{server}/huge",
            ],
            "attempt": [1] * 5,
        }
    )
    out = f.fetch_batch(pdf).set_index("url")
    gz = out.loc[f"{server}/gzip"]
    assert (gz["status"], gz["success"], gz["body"]) == (200, True, "nội dung nén")
    df_ = out.loc[f"{server}/deflate"]
    assert (df_["success"], df_["body"]) == (True, "deflated body")
    la = out.loc[f"{server}/latin1"]
    assert (la["success"], la["body"]) == (True, "café señor")
    br = out.loc[f"{server}/brotli"]
    assert (br["status"], br["success"]) == (200, False)  # loud, not mojibake
    hu = out.loc[f"{server}/huge"]
    assert (hu["status"], hu["success"]) == (413, False)


def test_http_fetcher_through_spark(spark, server):
    """The real fetch stage (applyInPandas grouped by host) over
    loopback sockets: success/failure flags must match a FixtureFetcher
    configured with the same transient-failure schedule."""
    rows = [
        (f"{server}/ok", "127.0.0.1", 0, 1),
        (f"{server}/missing", "127.0.0.1", 0, 1),
        (f"{server}/flaky", "127.0.0.1", 0, 1),
        (f"{server}/redirect", "127.0.0.1", 0, 1),
    ]
    scheduled = spark.createDataFrame(
        rows, "url string, host string, host_salt int, attempt int"
    )
    http = fetch_scheduled(
        scheduled, HttpFetcher(timeout_s=2.0, retries=5, backoff_s=0.01)
    )
    got = {r["url"]: (r["success"], r["status"]) for r in http.collect()}
    assert got[f"{server}/ok"] == (True, 200)
    assert got[f"{server}/missing"] == (False, 404)
    assert got[f"{server}/flaky"] == (True, 200)  # retries inside the UDF
    assert got[f"{server}/redirect"] == (True, 200)

    # FixtureFetcher twin on the same schedule: attempt=1 > fail_rounds=0
    # succeeds, missing 404s — flag parity with the socket path
    fixture = FixtureFetcher(
        pages={
            f"{server}/ok": ("hello loopback", 0, 1),
            f"{server}/flaky": ("finally up", 0, 1),
            f"{server}/redirect": ("hello loopback", 0, 1),
        }
    )
    fx = {
        r["url"]: (r["success"], r["status"])
        for r in fetch_scheduled(scheduled, fixture).collect()
    }
    assert {u: s for u, (s, _) in got.items()} == {
        u: s for u, (s, _) in fx.items()
    }


def test_http_fetcher_directives_over_sockets(server):
    """X-Robots-Tag header and meta/link markup parse at the fetch
    boundary: the DIRECTIVE_FIELDS columns come back filled over a
    real HTTP exchange, not just from unit-level parsing."""
    f = HttpFetcher(timeout_s=0.4, retries=2, backoff_s=0.01)
    pdf = pd.DataFrame(
        {
            "url": [
                f"{server}/robots-header",
                f"{server}/robots-meta",
                f"{server}/ok",
            ],
            "attempt": [1, 1, 1],
        }
    )
    out = f.fetch_batch(pdf).set_index("url")
    hdr = out.loc[f"{server}/robots-header"]
    assert bool(hdr["noindex"]) and bool(hdr["nofollow"])
    assert hdr["canonical"] is None
    meta = out.loc[f"{server}/robots-meta"]
    assert not bool(meta["noindex"]) and bool(meta["nofollow"])
    assert meta["canonical"] == "http://canon.test/page"
    assert meta["og_image"] == "http://canon.test/hero.jpg"
    assert meta["og_caption"] == "hero alt"
    assert meta["base_href"] == "/deep/dir/"
    plain = out.loc[f"{server}/ok"]
    assert not bool(plain["noindex"]) and not bool(plain["nofollow"])
    assert plain["canonical"] is None
    assert plain["og_image"] is None
    assert plain["base_href"] is None
