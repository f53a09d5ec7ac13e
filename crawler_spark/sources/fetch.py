"""Fetch stage: vectorized, host-partitioned page fetching (SURVEY S6).

The reference fetches one page at a time per site through a Playwright
browser with retry-5 + 15-min timeout (``thanhlinh.net/
getPageContent.ts:32-60``, ``src/lib/bluebird.ts:7-37``). The graft's
fetch stage is an ``applyInPandas`` over the round's scheduled rows
grouped by host: one task owns one host's (≤ budget) URLs per round —
politeness single-flight per host comes from the grouping itself, and
retry/timeout live *inside* the UDF (Spark task retry is too coarse; a
task = many URLs — SURVEY §4).

Fetchers are pluggable:

  * :class:`FixtureFetcher` — resolves URLs against the synthetic
    ``web_graph`` (broadcast at tiny scale); transient failures succeed
    once ``attempt > fail_rounds`` — deterministic, matching the
    oracle byte-for-byte.
  * :class:`HttpFetcher` — stdlib urllib with retry + timeout for a
    real deployment; tested against an in-process loopback
    ``http.server`` (tests/test_http_fetch.py) — no external network
    needed for 200/404/503-retry/timeout/redirect coverage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# applyInPandas costs ~1-3 ms per GROUP on this hardware class (pandas
# frame construction; BENCH.md §1b measured un-salting 15k tiny groups
# at 2.3x). Salting a host splits its round batch into up to N_SALTS
# groups, so it pays only when the host's per-round work dwarfs the
# added group overhead: at ~1 ms/URL fetch+parse cost, ≥256 URLs/host/
# round makes the worst-case added overhead (~16 × 3 ms) negligible
# against ≥256 ms of now-parallelizable work. Below it, single-flight
# per host is both faster and politer.
SALT_MIN_BUDGET = 256


def resolve_salted(mode: bool | str, budget_cap: int) -> bool:
    """Resolve a ``salted_fetch`` setting: True/False pass through;
    ``"auto"`` enables salting when the politeness budget cap says a
    single host can receive ≥ SALT_MIN_BUDGET URLs in one round (the
    dominant-domain skew case the north rule calls out)."""
    if mode == "auto":
        return budget_cap >= SALT_MIN_BUDGET
    return bool(mode)


FETCH_RESULT_FIELDS = [
    T.StructField("body", T.StringType(), True),
    T.StructField("status", T.IntegerType(), False),
    T.StructField("success", T.BooleanType(), False),
    T.StructField("latency_ms", T.IntegerType(), False),
]

# on-page crawl directives (meta robots / X-Robots-Tag / rel=canonical)
# — appended by fetchers that parse them; the engine honors these
# columns only when present, so the bare 4-column contract is a no-op
DIRECTIVE_FIELDS = [
    T.StructField("noindex", T.BooleanType(), False),
    T.StructField("nofollow", T.BooleanType(), False),
    T.StructField("canonical", T.StringType(), True),
]

# the page-declared representative image (og:image / twitter:image) —
# head metadata the HTML→MD body conversion never sees; the engine
# unions it into the extraction stream (img_order 0) when present
SOCIAL_FIELDS = [
    T.StructField("og_image", T.StringType(), True),
    T.StructField("og_caption", T.StringType(), True),
]

# <base href> — overrides the document URI as the RFC 3986 resolution
# base for every relative link/src on the page (HTML spec: first wins)
BASE_FIELDS = [T.StructField("base_href", T.StringType(), True)]

# appended by fetchers that surface redirect chains + HTTP validators
# (HttpFetcher); fixture fetchers keep the 4-column contract unchanged
HTTP_EXTRA_FIELDS = [
    T.StructField("final_url", T.StringType(), True),
    T.StructField("redirects", T.IntegerType(), False),
    T.StructField("not_modified", T.BooleanType(), False),
    T.StructField("etag", T.StringType(), True),
    T.StructField("last_modified", T.StringType(), True),
]


@dataclass
class FixtureFetcher:
    """Deterministic fetcher over the synthetic web graph.

    pages: {canonical_url: (body, fail_rounds, latency_ms)}
    directives: optional {url: (noindex, nofollow, canonical)} — when
        set, the fetcher emits the DIRECTIVE_FIELDS columns (fixture
        bodies are already markdown, so meta/header parsing happens
        here, at the fetch boundary, same as HttpFetcher).
    """

    pages: dict[str, tuple[str, int, int]]
    directives: dict[str, tuple[bool, bool, str | None]] | None = None
    social: dict[str, tuple[str, str]] | None = None

    #: fixture bodies are markdown — the HTML-attribute absolutizer
    #: must never run on them (prose containing href=-shaped text is
    #: content, not markup; fetch_scheduled gates on this)
    BODY_KIND = "markdown"

    @property
    def RESULT_FIELDS(self):  # noqa: N802 — fetcher-contract name
        return (
            FETCH_RESULT_FIELDS
            + (DIRECTIVE_FIELDS if self.directives is not None else [])
            + (SOCIAL_FIELDS if self.social is not None else [])
        )

    def fetch_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        bodies, statuses, succ, lat = [], [], [], []
        for url, attempt in zip(pdf["url"], pdf["attempt"]):
            spec = self.pages.get(url)
            if spec is None:
                bodies.append(None), statuses.append(404), succ.append(False), lat.append(1)
                continue
            body, fail_rounds, latency = spec
            if int(attempt) > fail_rounds:
                bodies.append(body), statuses.append(200), succ.append(True), lat.append(latency)
            else:
                bodies.append(None), statuses.append(503), succ.append(False), lat.append(latency)
        out = pdf.copy()
        out["body"], out["status"], out["success"], out["latency_ms"] = (
            bodies,
            statuses,
            succ,
            lat,
        )
        if self.directives is not None:
            d = [self.directives.get(u, (False, False, None)) for u in pdf["url"]]
            out["noindex"] = [x[0] for x in d]
            out["nofollow"] = [x[1] for x in d]
            out["canonical"] = [x[2] for x in d]
        if self.social is not None:
            s = [self.social.get(u, (None, None)) for u in pdf["url"]]
            out["og_image"] = [x[0] for x in s]
            out["og_caption"] = [x[1] for x in s]
        return out


@dataclass
class SyntheticFetcher:
    """Deterministic page generator for scale benchmarks (no network).

    Bodies are derived from the URL with vectorized pandas/numpy ops —
    each page gets a title, ``n_images`` markdown image+caption pairs,
    and ``n_links`` outlinks, so the downstream extract/discover stages
    see realistic shapes. Stands in for network+render cost with pure
    CPU; keeps the fetch stage embarrassingly parallel, which is what a
    real fetch stage is (each host's batch is independent I/O).
    """

    n_images: int = 2
    n_links: int = 4
    filler_words: int = 120

    BODY_KIND = "markdown"  # generated bodies are markdown

    def fetch_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        import numpy as np

        urls = pdf["url"].astype(str)
        # deterministic per-url content hash (crc32 is a C call; stable
        # across processes, unlike Python's salted hash())
        h = np.array(
            [zlib.crc32(u.encode()) for u in urls], dtype=np.int64
        ).astype(str)
        body = "# Trang " + urls + "\n\n"
        for i in range(self.n_images):
            body = (
                body
                + "![Hình "
                + h
                + f"-{i}]("
                + urls
                + "/img-"
                + h
                + f"-{i}.png)\n\n"
            )
        filler = " ".join(f"từ{k}" for k in range(self.filler_words))
        body = body + filler + "\n\n"
        for i in range(self.n_links):
            body = body + "[chương " + h + f"-{i}](" + urls + "/ch" + f"{i})\n"
        out = pdf.copy()
        out["body"] = body
        out["status"] = 200
        out["success"] = True
        out["latency_ms"] = 1
        return out


@dataclass
class HttpFetcher:
    """Real-network fetcher (urllib), retry w/ backoff inside the UDF.

    Per-URL retry mirrors the reference's async-retry budget; a whole
    Spark-task retry would re-fetch every URL in the batch.
    """

    timeout_s: float = 30.0
    retries: int = 5
    backoff_s: float = 0.5
    max_bytes: int = 64 << 20  # response-size bomb guard
    accept_gzip: bool = True

    @staticmethod
    def _decode_body(raw: bytes, headers) -> str | None:
        """Content-Encoding (gzip/deflate/identity) + charset from the
        Content-Type parameter. Encodings we never offered (br/zstd —
        no codec available) → None, so the row fails loud instead of
        yielding mojibake."""
        import zlib

        enc = (headers.get("Content-Encoding") or "identity").strip().lower()
        if enc == "gzip" or enc == "x-gzip":
            try:
                raw = zlib.decompress(raw, 16 + zlib.MAX_WBITS)
            except zlib.error:
                return None
        elif enc == "deflate":
            try:  # zlib-wrapped first, raw-deflate fallback (old IIS)
                raw = zlib.decompress(raw)
            except zlib.error:
                try:
                    raw = zlib.decompress(raw, -zlib.MAX_WBITS)
                except zlib.error:
                    return None
        elif enc not in ("identity", ""):
            return None
        charset = "utf-8"
        ctype = headers.get("Content-Type") or ""
        for part in ctype.split(";")[1:]:
            k, _, v = part.strip().partition("=")
            if k.lower() == "charset" and v:
                charset = v.strip("\"' ")
        try:
            return raw.decode(charset, "replace")
        except LookupError:  # unknown charset label
            return raw.decode("utf-8", "replace")

    max_redirects: int = 10

    #: raw HTML off the wire — links live in href/src/srcset
    #: attributes, so fetch_scheduled runs the HTML absolutizer
    BODY_KIND = "html"

    RESULT_FIELDS = (
        FETCH_RESULT_FIELDS
        + HTTP_EXTRA_FIELDS
        + DIRECTIVE_FIELDS
        + SOCIAL_FIELDS
        + BASE_FIELDS
    )

    def _open_no_redirect(self, url: str, headers: dict):
        """One request with redirects surfaced as HTTPError (urllib
        auto-follow hides the chain — a crawler must SEE it: the final
        URL joins the url-seen set, link resolution uses it as base,
        and politeness accounting must notice an off-host hop)."""
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, hdrs, newurl):
                return None  # → urlopen raises HTTPError with the 3xx

        opener = urllib.request.build_opener(_NoRedirect)
        req = urllib.request.Request(url, headers=headers)
        return opener.open(req, timeout=self.timeout_s)

    def _fetch_one(
        self,
        url: str,
        etag: str | None = None,
        last_modified: str | None = None,
    ) -> dict:
        """One URL through the retry budget. Mirrors the reference's
        async-retry loop (getPageContent.ts:45-52 — 5 attempts,
        exponential backoff): transient failures (5xx, timeouts,
        connection errors) retry the WHOLE chain; 4xx is permanent and
        returns immediately. Redirects (301/302/303/307/308) are
        followed manually up to ``max_redirects`` hops with relative
        Location resolution and cycle detection; the final URL + hop
        count are surfaced. Stored validators are sent as
        If-None-Match / If-Modified-Since on the FIRST hop (they
        belong to the original resource); a 304 reports
        ``not_modified`` with success=True and no body. Negotiates
        gzip/deflate and honors the response charset. Exercised
        against a loopback http.server in tests/test_http_fetch.py."""
        import urllib.error
        import urllib.parse

        def result(
            body=None, status=0, final=url, hops=0, nm=False, et=None, lm=None,
            xr=None,
        ):
            from crawler_spark.functions.html import (
                base_href,
                page_directives,
                social_image,
            )

            noindex, nofollow, canonical = page_directives(body, xr)
            social = social_image(body)
            base = base_href(body)
            return {
                "body": body,
                "status": int(status),
                "success": body is not None or nm,
                "final_url": final,
                "redirects": hops,
                "not_modified": nm,
                "etag": et,
                "last_modified": lm,
                "noindex": noindex,
                "nofollow": nofollow,
                "canonical": canonical,
                "og_image": social[0] if social else None,
                "og_caption": social[1] if social else None,
                "base_href": base,
            }

        base_headers: dict = {}
        if self.accept_gzip:
            base_headers["Accept-Encoding"] = "gzip, deflate"
        status = 0
        for k in range(self.retries):
            if k:
                time.sleep(self.backoff_s * (2 ** (k - 1)))
            cur, hops, visited = url, 0, {url}
            while True:  # follow one redirect chain
                headers = dict(base_headers)
                if hops == 0:
                    if etag:
                        headers["If-None-Match"] = etag
                    if last_modified:
                        headers["If-Modified-Since"] = last_modified
                try:
                    with self._open_no_redirect(cur, headers) as r:
                        raw = r.read(self.max_bytes + 1)
                        if len(raw) > self.max_bytes:
                            return result(status=413, final=cur, hops=hops)
                        return result(
                            body=self._decode_body(raw, r.headers),
                            status=r.status,
                            final=cur,
                            hops=hops,
                            et=r.headers.get("ETag"),
                            lm=r.headers.get("Last-Modified"),
                            # repeated X-Robots-Tag headers are legal
                            # (CDN + origin layering) — union them all
                            xr=", ".join(
                                r.headers.get_all("X-Robots-Tag") or []
                            )
                            or None,
                        )
                except urllib.error.HTTPError as e:
                    status = int(e.code)
                    if status in (301, 302, 303, 307, 308):
                        loc = e.headers.get("Location")
                        if not loc or hops >= self.max_redirects:
                            return result(status=status, final=cur, hops=hops)
                        nxt = urllib.parse.urljoin(cur, loc)
                        if nxt in visited:  # redirect loop — permanent
                            return result(status=status, final=cur, hops=hops)
                        visited.add(nxt)
                        cur, hops = nxt, hops + 1
                        continue
                    if status == 304:
                        return result(status=304, final=cur, hops=hops, nm=True)
                    if 400 <= status < 500:
                        # permanent — don't burn retries
                        return result(status=status, final=cur, hops=hops)
                    break  # 5xx → outer retry
                except Exception:
                    status = 599  # timeout / connection error
                    break
        return result(status=status)

    def fetch_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        has_validators = "etag" in pdf.columns and "last_modified" in pdf.columns
        rows, lat = [], []
        for i, url in enumerate(pdf["url"]):
            et = lm = None
            if has_validators:
                et = pdf["etag"].iloc[i]
                lm = pdf["last_modified"].iloc[i]
                et = None if pd.isna(et) else str(et)
                lm = None if pd.isna(lm) else str(lm)
            t0 = time.monotonic()
            rows.append(self._fetch_one(str(url), etag=et, last_modified=lm))
            lat.append(int((time.monotonic() - t0) * 1000))
        out = pdf.drop(columns=["etag", "last_modified"], errors="ignore").copy()
        for col in (
            "body",
            "status",
            "success",
            "final_url",
            "redirects",
            "not_modified",
            "etag",
            "last_modified",
            "noindex",
            "nofollow",
            "canonical",
            "og_image",
            "og_caption",
            "base_href",
        ):
            out[col] = [r[col] for r in rows]
        out["latency_ms"] = lat
        return out


def fetch_scheduled(
    scheduled: DataFrame,
    fetcher,
    salted: bool = False,
    num_partitions: int | None = None,
    csr_recover: bool = False,
) -> DataFrame:
    """Run the fetch UDF grouped by host (politeness co-location).

    Default (``salted=False``): one task owns one host's (≤ budget)
    URLs — single-flight per host, the reference's implicit politeness
    (``crawler.ts:292-510``). Group size is bounded by the round
    budget, so no host can skew the stage.

    ``salted=True``: group by (host, host_salt) — a dominant host with
    a large budget splits into N_SALTS parallel fetch streams (north
    rule: dominant-domain skew broken by salting). Results are
    identical either way — scheduling order (``host_rank``) is
    assigned *before* the fetch — only task layout changes; use it
    when the fetcher itself rate-limits per host (HTTP client token
    bucket) rather than relying on single-flight placement.

    ``csr_recover=True`` (html bodies only): run
    :func:`crawler_spark.functions.hydration.recover_csr` before
    absolutization — <noscript> promotion plus hydration-payload /
    JSON-LD content recovery for thin-shell client-rendered pages
    (the no-browser answer to the reference's Playwright flows).
    Opt-in: it appends a marked block to qualifying bodies, so byte
    goldens against server-rendered fixtures keep it off.

    The group exchange is pinned with an explicit ``repartition(n,
    keys)``: AQE's partition coalescing sizes post-shuffle partitions
    by MAP-OUTPUT BYTES, but this stage's cost is per-URL fetch/parse
    work the byte heuristic cannot see — a round of 200 k scheduled
    URLs is ~20 MB, so AQE would coalesce every salt group into ONE
    task and silently serialize the whole fetch (measured: salting at
    0.87× instead of >3× before the pin; BENCH.md §1e). A user-pinned
    partition count is exempt from coalescing, and because the child
    is hash-partitioned on exactly the grouping keys, applyInPandas
    adds no second exchange.
    """
    result_fields = getattr(fetcher, "RESULT_FIELDS", FETCH_RESULT_FIELDS)
    body_kind = getattr(fetcher, "BODY_KIND", "auto")
    result_names = {f.name for f in result_fields}
    # stored validators (etag/last_modified) on the scheduled rows are
    # INPUTS the fetcher consumes and re-emits fresh — drop the input
    # copy from the output schema so names stay unique
    out_schema = T.StructType(
        [f for f in scheduled.schema.fields if f.name not in result_names]
        + result_fields
    )

    def _fetch(pdf: pd.DataFrame) -> pd.DataFrame:
        out = fetcher.fetch_batch(pdf)
        # normalize link space at THE Python boundary that already
        # exists: rewrite relative markdown refs to absolute against
        # <base href> (itself resolved) else the post-redirect URI
        # else the request URL, and resolve relative rel=canonical /
        # og:image declarations. Downstream JVM stages (discovery,
        # extraction) then stay pure canonicalize — no per-round plan
        # growth (see canonical.absolutize_md for the measurements).
        from crawler_spark.canonical import (
            absolutize_html,
            absolutize_md,
            resolve_url,
        )

        cols = out.columns
        bodies = out["body"].tolist()
        urls = out["url"].tolist()
        finals = out["final_url"].tolist() if "final_url" in cols else None
        basehs = out["base_href"].tolist() if "base_href" in cols else None
        canons = out["canonical"].tolist() if "canonical" in cols else None
        ogs = out["og_image"].tolist() if "og_image" in cols else None
        for i, body in enumerate(bodies):
            doc = (finals[i] if finals is not None else None) or urls[i]
            base = (
                resolve_url(doc, basehs[i])
                if basehs is not None and basehs[i]
                else doc
            )
            if body is not None:
                # which absolutizer runs is the FETCHER's declaration
                # (BODY_KIND), not a content sniff: markdown bodies
                # whose prose contains href=-shaped text must never
                # hit the HTML pass, and raw-HTML bodies' markdown-
                # shaped prose must never hit the md pass — both
                # rewrites would mutate content bytes. "auto" (an
                # unmarked third-party fetcher) keeps the legacy
                # both-passes behavior behind the '<' sniff.
                if body_kind in ("markdown", "auto"):
                    body = absolutize_md(body, base)
                if body_kind == "html" or (body_kind == "auto" and "<" in body):
                    if csr_recover:
                        # CSR recovery BEFORE absolutization so the
                        # recovered <img>/<figure> block's (possibly
                        # relative) URLs get the same base resolution
                        # as author-written markup
                        from crawler_spark.functions.hydration import (
                            recover_csr,
                        )

                        body = recover_csr(body)
                    body = absolutize_html(body, base)
                bodies[i] = body
            if canons is not None and canons[i]:
                canons[i] = resolve_url(base, canons[i])
            if ogs is not None and ogs[i]:
                ogs[i] = resolve_url(base, ogs[i])
        out["body"] = bodies
        if canons is not None:
            out["canonical"] = canons
        if ogs is not None:
            out["og_image"] = ogs
        return out

    keys = ["host", "host_salt"] if salted else ["host"]
    if num_partitions is None:
        num_partitions = int(
            scheduled.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    return (
        scheduled.repartition(num_partitions, *keys)
        .groupBy(*keys)
        .applyInPandas(_fetch, out_schema)
    )
