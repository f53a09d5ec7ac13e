"""URL canonicalization — the dedup key of the frontier.

The reference dedups on raw ``sourceURL`` string equality (first-wins
``uniqBy``, e.g. ``src/sites/thanhlinh.net/getMetadataList.ts:197``) and
on checkpoint ids (``src/lib/crawler/checkpoint.ts:100-114``). At
10^10-URL scale raw-string equality misses trivial aliases, so the graft
defines an explicit canonicalization SPEC, implemented twice and tested
for agreement:

  * :func:`canonicalize` — pure Python (used by the sequential oracle
    and inside pandas UDFs);
  * :func:`canonical_url_col` — a Spark Column of built-in expressions
    (JVM-side, whole-stage-codegen'd — the hot path).

Spec (applied in order):
  0. non-hierarchical schemes (``data:``/``about:``/``mailto:``/
     ``javascript:``) pass through trimmed but otherwise UNCHANGED —
     a data URI's payload is case-significant (base64), and none of
     these ever reach the frontier (they carry no host)
  1. strip surrounding whitespace
  2. drop the ``#fragment``
  3. default scheme ``http`` if missing ``://``
  4. lowercase scheme and host:port (path/query case preserved)
  5. strip default ports ``:80`` (http) / ``:443`` (https)
  6. collapse duplicate slashes in the path (not in the query)
  7. strip a single trailing ``/`` from a non-root path
  8. strip a trailing ``?``

The 64-bit frontier key is ``xxhash64(canonical_url)`` (Spark built-in);
the oracle compares on canonical-url strings so the two implementations
never need matching hash values.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")

#: opaque (non-hierarchical) schemes: canonicalization is identity
_OPAQUE_RE = re.compile(r"^(?:data|about|mailto|javascript):", re.I)


def canonicalize(url: str) -> str:
    """Pure-Python mirror of :func:`canonical_url_col`."""
    u = url.strip()
    if _OPAQUE_RE.match(u):
        return u
    hash_idx = u.find("#")
    if hash_idx >= 0:
        u = u[:hash_idx]
    m = _SCHEME_RE.match(u)
    if m:
        scheme = m.group(1).lower()
        rest = u[m.end() :]
    else:
        scheme = "http"
        rest = u
    hm = re.match(r"^([^/?#]*)(.*)$", rest, re.S)
    hostport = hm.group(1).lower()
    tail = hm.group(2)
    if scheme == "http":
        hostport = re.sub(r":80$", "", hostport)
    elif scheme == "https":
        hostport = re.sub(r":443$", "", hostport)
    q_idx = tail.find("?")
    path, query = (tail, "") if q_idx < 0 else (tail[:q_idx], tail[q_idx:])
    path = re.sub(r"/{2,}", "/", path)
    if len(path) > 1:
        path = re.sub(r"/$", "", path)
    if query == "?":
        query = ""
    return f"{scheme}://{hostport}{path}{query}"


def canonical_url_col(url: Column | str) -> Column:
    """Spark built-in-expression implementation of the canonicalization
    spec — no UDF, stays inside whole-stage codegen. Must agree with
    :func:`canonicalize` byte-for-byte (tested on a seeded adversarial corpus)."""
    c = F.col(url) if isinstance(url, str) else url
    t = F.trim(c)  # parity with canonicalize() tested in tests/test_canonical.py
    u = F.regexp_replace(t, r"(?s)#.*$", "")
    has_scheme = u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    u = F.when(has_scheme, u).otherwise(F.concat(F.lit("http://"), u))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"(?s)^([^/?#]*)", 1))
    hostport = (
        F.when(scheme == F.lit("http"), F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    tail = F.regexp_replace(rest, r"(?s)^[^/?#]*", "")
    path = F.regexp_extract(tail, r"(?s)^([^?]*)", 1)
    query = F.regexp_replace(tail, r"(?s)^[^?]*", "")
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(F.length(path) > 1, F.regexp_replace(path, r"/$", "")).otherwise(path)
    query = F.when(query == F.lit("?"), F.lit("")).otherwise(query)
    hier = F.concat(scheme, F.lit("://"), hostport, path, query)
    return F.when(
        t.rlike(r"^(?i)(?:data|about|mailto|javascript):"), t
    ).otherwise(hier)


def resolve_url(base: str, ref: str) -> str:
    """RFC 3986 §5 reference resolution — Python twin (urljoin), used
    by the sequential oracle and pandas UDFs. ``base`` should be a
    canonical URL; the result is NOT canonicalized (callers chain
    :func:`canonicalize`)."""
    from urllib.parse import urljoin

    ref = ref.strip()
    if _OPAQUE_RE.match(ref):
        return ref
    return urljoin(base, ref)


_MD_REF_RE = re.compile(r"(!?\[[^\]]*\])\(([^)]*)\)")
_ABS_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def absolutize_md(body: str, base: str) -> str:
    """Rewrite every RELATIVE markdown link/image ref in ``body`` to
    its absolute form against ``base`` (RFC 3986, urljoin).

    This runs INSIDE the fetch stage's existing Python boundary
    (sources/fetch.fetch_scheduled), where the body is in hand and the
    work is Arrow-parallel — so the per-round JVM plans stay exactly
    as cheap as in the absolute-URL world. (Both pure-Column variants
    measured badly in the engine loop: a regex fixed-point bloated
    Catalyst optimization time, and an aggregate() HOF is
    CodegenFallback, interpreting the whole projection — 5× on
    tools/bench_engine.py. One C-speed regex pass per body here is
    noise next to the fetch itself.) Absolute and opaque (data:,
    mailto:) refs pass through byte-identical. Fenced code blocks and
    inline code spans are content, not links — they pass through
    byte-identical (a ``[x](y)`` inside a fence is sample code;
    rewriting it mutates the page's bytes)."""
    def _sub(m: re.Match) -> str:
        ref = m.group(2)
        if not ref or _ABS_RE.match(ref.strip()) or ref.startswith("//"):
            if ref.startswith("//"):  # protocol-relative: adopt base scheme
                return f"{m.group(1)}({resolve_url(base, ref)})"
            return m.group(0)
        return f"{m.group(1)}({resolve_url(base, ref)})"

    # _MD_CODE_RE has ONE capture group, so split() alternates
    # prose, code, prose, code … — rewrite only the even (prose) slots
    parts = _MD_CODE_RE.split(body)
    return "".join(
        p if i % 2 else _MD_REF_RE.sub(_sub, p) for i, p in enumerate(parts)
    )


#: protected markdown regions: fenced code blocks (``` / ~~~ up to the
#: closing fence or EOF, CommonMark's unclosed-fence rule) and inline
#: code spans (single line, no nesting)
_MD_CODE_RE = re.compile(
    r"(?sm)(^[ \t]{0,3}```.*?(?:^[ \t]{0,3}```[^\n]*$|\Z)"
    r"|^[ \t]{0,3}~~~.*?(?:^[ \t]{0,3}~~~[^\n]*$|\Z)"
    r"|`[^`\n]+`)"
)


_HTML_URL_ATTR_RE = re.compile(
    r"""(?is)\b(href|src|data-src|data-lazy-src|data-original|poster)"""
    r"""\s*=\s*("[^"]*"|'[^']*'|[^\s"'=<>`]+)"""
)
_HTML_SRCSET_RE = re.compile(
    r"""(?is)\b(srcset|data-srcset)\s*=\s*("[^"]*"|'[^']*')"""
)


def absolutize_html(body: str, base: str) -> str:
    """The HTML twin of :func:`absolutize_md`: rewrite relative URL
    attributes (href/src/lazy-load variants/poster, plus every srcset
    candidate) to absolute against ``base``. HttpFetcher bodies are
    raw HTML — markdown-ref rewriting alone never sees their links,
    and a later HTML→MD conversion would hand pure-canonicalize
    stages a bare "img/x.jpg" that mangles into a garbage host.
    Absolute/opaque values and all other bytes pass through
    unchanged; rewritten attributes come back double-quoted."""

    def _ref(v: str) -> str | None:
        v = v.strip()
        if not v or v.startswith("#") or (
            _ABS_RE.match(v) and not v.startswith("//")
        ):
            return None
        return resolve_url(base, v)

    def _attr(m: re.Match) -> str:
        raw = m.group(2)
        val = raw[1:-1] if raw[:1] in "\"'" else raw
        new = _ref(val)
        return m.group(0) if new is None or new == val else f'{m.group(1)}="{new}"'

    def _srcset(m: re.Match) -> str:
        # spec tokenizer shared with functions/html.py: a data-URI
        # candidate stays one token (its base64 comma is NOT a
        # candidate separator) and _ref leaves it untouched via
        # _ABS_RE, so the stored attribute bytes can't be corrupted
        from crawler_spark.functions.html import split_srcset

        parts = []
        changed = False
        for url, desc in split_srcset(m.group(2)[1:-1]):
            new = _ref(url)
            if new is not None and new != url:
                url = new
                changed = True
            parts.append(f"{url} {desc}".strip() if desc else url)
        if not changed:
            return m.group(0)
        return f'{m.group(1)}="{", ".join(parts)}"'

    body = _HTML_SRCSET_RE.sub(_srcset, body)
    return _HTML_URL_ATTR_RE.sub(_attr, body)


def resolve_url_col(base: Column | str, ref: Column | str) -> Column:
    """RFC 3986 §5 resolution as built-in Column expressions — the
    JVM/codegen twin of :func:`resolve_url` (agreement fuzz-tested
    against urljoin in tests/test_canonical.py). ``base`` must be a
    CANONICAL absolute URL (the engine's page URLs are).

    Case split (spec §5.2.2): absolute ref → as-is; protocol-relative
    ``//h/p`` → base scheme; root-relative ``/p`` → base origin;
    ``?q``/``#f`` → base path + suffix; else merge with the base
    directory. Dot segments are removed by ONE ``aggregate()`` HOF
    over the path segments — exact at ANY depth, but a
    CodegenFallback expression (same cost note as absolutize_md's
    bench comment). The engine's hot path resolves at the fetch
    boundary in Python (sources/fetch.py); this Column variant exists
    for tests/oracle parity only."""
    b = F.col(base) if isinstance(base, str) else base
    r = F.trim(F.col(ref) if isinstance(ref, str) else ref)

    scheme = F.regexp_extract(b, r"^([a-z][a-z0-9+.-]*)://", 1)
    origin = F.regexp_extract(b, r"^([a-z][a-z0-9+.-]*://[^/?#]*)", 1)
    bpath = F.regexp_extract(b, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    bdir = F.regexp_replace(bpath, r"[^/]*$", "")
    bdir = F.when(bdir == F.lit(""), F.lit("/")).otherwise(bdir)

    rpath = F.regexp_extract(r, r"^([^?#]*)", 1)
    rtail = F.regexp_replace(r, r"^[^?#]*", "")  # ?query and/or #frag

    # root-relative refs replace the base path; others merge into the
    # base directory — both then get identical dot-segment removal
    # (urljoin normalizes dots in BOTH forms).
    mpath = F.when(rpath.startswith("/"), rpath).otherwise(
        F.concat(bdir, rpath)
    )  # always starts with "/"
    # dot-segment removal (§5.2.4) as ONE aggregate() over the path
    # segments — exact at any depth, and a single expression node (a
    # regex fixed-point here bloats the per-round plan enough to make
    # Catalyst optimization the crawl bottleneck): "." drops, ".."
    # pops (over-pops at the root are ignored per spec), and a
    # trailing "."/".." leaves a directory (trailing slash)
    segs = F.split(F.regexp_replace(mpath, r"^/", ""), "/")
    kept = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(s == "..", F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))))
        .otherwise(F.concat(acc, F.array(s))),
    )
    kept = F.when(
        F.element_at(segs, -1).isin(".", ".."),
        F.concat(kept, F.array(F.lit(""))),
    ).otherwise(kept)
    mpath = F.concat(F.lit("/"), F.array_join(kept, "/"))
    relative = F.concat(origin, mpath, rtail)

    has_scheme = r.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    return (
        F.when(r == F.lit(""), b)
        .when(has_scheme, r)  # absolute (incl. opaque data:/mailto:)
        .when(r.startswith("//"), F.concat(scheme, F.lit(":"), r))
        .when(r.startswith("#"), F.concat(b, r))
        .when(r.startswith("?"), F.concat(origin, bpath, r))
        .otherwise(relative)
    )


def host_col(canonical: Column | str) -> Column:
    """Host (without port) of a canonical URL — the politeness partition
    key (north rule: frontier hash-partitioned by host)."""
    c = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)


def host_of(url: str) -> str:
    """Python mirror of :func:`host_col` (canonicalizes first)."""
    c = canonicalize(url)
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", c)
    return m.group(1) if m else ""


def url_key_col(canonical: Column | str) -> Column:
    """64-bit frontier key: xxhash64 of the canonical URL."""
    c = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.xxhash64(c)
