"""Client-side-rendered (CSR) content recovery — deterministic, no JS.

The reference crawls every site through a real browser
(`src/sites/*/getPageContent*.ts` all drive Playwright), so pages that
render their content client-side are in scope for it but unreachable
for a byte-level fetcher: this sandbox has no browser, and at 100 TB a
browser per page is not a scale design anyway. A large class of CSR
pages is nonetheless recoverable WITHOUT executing JavaScript, because
modern frameworks serialize the page's data into the HTML itself:

  * **hydration payloads** — Next.js emits the full page props as
    ``<script id="__NEXT_DATA__" type="application/json">``; Redux /
    Vuex / Apollo apps assign ``window.__INITIAL_STATE__`` /
    ``__PRELOADED_STATE__`` / ``__APOLLO_STATE__`` JSON literals
    (emitted via ``JSON.stringify`` — valid JSON in the wild);
  * **JSON-LD** — ``<script type="application/ld+json">`` carries
    schema.org ``Article``/``NewsArticle`` nodes with ``headline``,
    ``articleBody``, and ``image`` (``ImageObject`` with ``caption``);
  * **noscript fallbacks** — lazy-image libraries put the real
    ``<img>`` inside ``<noscript>``, which a non-JS consumer should
    treat as the rendered branch.

This module recovers those three signals with DETERMINISTIC, bounded
rules (no heuristic scoring): every extraction is a fixed traversal in
document order with explicit size/depth caps, so the same bytes always
yield the same output on any executor.

Scale discipline: all functions are pure ``str -> value`` (usable
inside the existing Arrow-batched fetch UDF — no new shuffle, no new
Python boundary), parse work is capped per block
(``_MAX_JSON_BYTES``), the state walk is depth- and fanout-capped, and
malformed JSON is skipped silently (a hostile page can cost at most
one failed ``json.loads`` of a capped block).

Reference parity note: the reference's Playwright flows read the DOM
*after* hydration (e.g. `thanhlinh.net/getPageContent.ts:32-60`
waits for selectors before extracting). For pages whose hydrated DOM
is a pure render of the serialized payload — the framework contract —
recovering the payload recovers the same content. Pages that fetch
content over XHR after load (no serialized payload) remain out of
reach and are documented residue.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# -- caps (explicit so the cost ceiling is auditable) -------------------
_MAX_JSON_BYTES = 2 * 1024 * 1024  # per script block handed to json.loads
_MAX_WALK_DEPTH = 64               # state-walk recursion bound
_MAX_WALK_STRINGS = 256            # collected text fragments per page
_MAX_IMAGES = 64                   # collected image records per page

_NOSCRIPT_RE = re.compile(r"(?is)<noscript\b[^>]*>(.*?)</noscript>")
_JSONLD_RE = re.compile(
    r"(?is)<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script>"
)
_NEXT_DATA_RE = re.compile(
    r"(?is)<script\b[^>]*id\s*=\s*[\"']__NEXT_DATA__[\"'][^>]*>(.*?)</script>"
)
# window.__X__ = {...};  — the well-known SSR state globals. The JSON
# payload is brace-matched (string-aware), not regex-captured, so
# nested objects and "};" inside strings can't truncate it.
_STATE_ASSIGN_RE = re.compile(
    r"window\.(__INITIAL_STATE__|__PRELOADED_STATE__|__APOLLO_STATE__|"
    r"__INITIAL_DATA__|__DATA__)\s*=\s*"
)
_CDATA_RE = re.compile(r"(?s)^\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*$")

# keys whose STRING values the state walk treats as page text, in the
# order they matter (a fixed allowlist, not a scorer)
_TEXT_KEYS = ("articleBody", "body", "content", "html", "text", "description")
_HEADLINE_KEYS = ("headline", "title")
# keys that name an image URL on a node; caption-ish siblings
_IMG_URL_KEYS = ("contentUrl", "url", "src", "imageUrl", "image_url")
_IMG_CAP_KEYS = ("caption", "description", "alt", "name")
_ARTICLE_TYPES = {
    "Article", "NewsArticle", "BlogPosting", "Report", "ScholarlyArticle",
    "TechArticle", "SocialMediaPosting", "WebPage", "ItemPage",
}


def promote_noscript(html: str) -> str:
    """Replace each ``<noscript>`` element with its inner markup.

    For a non-JS consumer the noscript branch IS the rendered branch
    (HTML5 §4.12.2: when scripting is disabled the contents are parsed
    as normal markup) — promoting it lets the existing ``<img>`` /
    srcset / figcaption pipeline see lazy-loaded images' real URLs.
    """
    return _NOSCRIPT_RE.sub(lambda m: m.group(1), html)


def _load_json(text: str):
    if text is None or len(text) > _MAX_JSON_BYTES:
        return None
    m = _CDATA_RE.match(text)
    if m:
        text = m.group(1)
    try:
        return json.loads(text)
    except (ValueError, RecursionError):
        return None


def _match_braces(s: str, start: int) -> str | None:
    """Return the balanced ``{...}``/``[...]`` literal starting at
    ``start`` (string-aware: braces inside JSON strings don't count).
    Returns None when unbalanced or over the size cap."""
    if start >= len(s) or s[start] not in "{[":
        return None
    open_ch = s[start]
    close_ch = "}" if open_ch == "{" else "]"
    depth = 0
    in_str = False
    esc = False
    limit = min(len(s), start + _MAX_JSON_BYTES)
    for i in range(start, limit):
        c = s[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return s[start : i + 1]
    return None


def extract_jsonld(html: str) -> list[dict]:
    """All JSON-LD nodes in document order, ``@graph`` flattened.

    Blocks that fail strict ``json.loads`` are skipped (no repair —
    determinism over recall). A top-level list contributes its dict
    elements; a ``@graph`` contributes its members after the carrier.
    """
    out: list[dict] = []
    for m in _JSONLD_RE.finditer(html):
        data = _load_json(m.group(1))
        nodes = data if isinstance(data, list) else [data]
        for node in nodes:
            if not isinstance(node, dict):
                continue
            out.append(node)
            graph = node.get("@graph")
            if isinstance(graph, list):
                out.extend(g for g in graph if isinstance(g, dict))
    return out


def extract_state_json(html: str) -> list[tuple[str, dict]]:
    """Serialized hydration payloads in document order as
    ``(source, payload)`` pairs: ``__NEXT_DATA__`` script blocks and
    ``window.__*_STATE__``-style assignments whose right-hand side is
    a valid JSON object/array literal."""
    out: list[tuple[str, dict]] = []
    for m in _NEXT_DATA_RE.finditer(html):
        data = _load_json(m.group(1))
        if isinstance(data, dict):
            out.append(("__NEXT_DATA__", data))
    for m in _STATE_ASSIGN_RE.finditer(html):
        lit = _match_braces(html, m.end())
        if lit is None:
            continue
        data = _load_json(lit)
        if isinstance(data, (dict, list)):
            out.append((m.group(1), data))
    return out


def _walk_strings(node, keys: tuple[str, ...], depth: int = 0,
                  out: list | None = None) -> list[str]:
    """Depth-first, document-order collection of string values held
    under an allowlisted key. Fixed traversal order (dict insertion
    order = JSON document order) keeps the result deterministic."""
    if out is None:
        out = []
    if depth > _MAX_WALK_DEPTH or len(out) >= _MAX_WALK_STRINGS:
        return out
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(v, str) and k in keys and v.strip():
                out.append(v)
                if len(out) >= _MAX_WALK_STRINGS:
                    return out
            elif isinstance(v, (dict, list)):
                _walk_strings(v, keys, depth + 1, out)
    elif isinstance(node, list):
        for v in node:
            if isinstance(v, (dict, list)):
                _walk_strings(v, keys, depth + 1, out)
    return out


def _image_records(node, depth: int = 0, out: list | None = None) -> list:
    """Collect ``(url, caption)`` pairs from ImageObject-shaped dicts:
    any dict carrying an image-URL key; the caption is the first
    caption-key sibling (else ``""``). Plain-string ``image`` values
    also count (schema.org allows ``image: "https://..."``)."""
    if out is None:
        out = []
    if depth > _MAX_WALK_DEPTH or len(out) >= _MAX_IMAGES:
        return out
    if isinstance(node, dict):
        img = node.get("image")
        if isinstance(img, str) and img.strip():
            out.append((img.strip(), ""))
        url = next(
            (node[k] for k in _IMG_URL_KEYS
             if isinstance(node.get(k), str) and node[k].strip()),
            None,
        )
        is_imgobj = node.get("@type") == "ImageObject" or (
            url is not None and any(k in node for k in _IMG_CAP_KEYS)
        )
        if url is not None and is_imgobj:
            cap = next(
                (node[k] for k in _IMG_CAP_KEYS
                 if isinstance(node.get(k), str) and node[k].strip()),
                "",
            )
            out.append((url.strip(), cap.strip()))
        for v in node.values():
            if isinstance(v, (dict, list)):
                _image_records(v, depth + 1, out)
    elif isinstance(node, list):
        for v in node:
            if isinstance(v, (dict, list)):
                _image_records(v, depth + 1, out)
    return out[:_MAX_IMAGES]


def hydrated_content(html: str) -> dict:
    """The page's serialized content as a plain dict:

    ``headline``  first ``headline``/``name`` on an Article-typed
                  JSON-LD node (document order);
    ``body``      first JSON-LD ``articleBody``; else the state-walk
                  text fragments (allowlisted keys, document order)
                  joined with blank lines;
    ``images``    ``(url, caption)`` pairs from JSON-LD then
                  hydration payloads, first-wins de-duplicated by URL.
    """
    jsonld = extract_jsonld(html)
    headline = None
    body = None
    for node in jsonld:
        t = node.get("@type")
        types = set(t) if isinstance(t, list) else {t}
        if types & _ARTICLE_TYPES:
            if headline is None:
                h = node.get("headline") or node.get("name")
                if isinstance(h, str) and h.strip():
                    headline = h.strip()
            if body is None:
                b = node.get("articleBody")
                if isinstance(b, str) and b.strip():
                    body = b
    states = extract_state_json(html)
    if body is None:
        frags: list[str] = []
        for _, payload in states:
            _walk_strings(payload, _TEXT_KEYS, 0, frags)
        if frags:
            body = "\n\n".join(frags[:_MAX_WALK_STRINGS])
    if headline is None:
        for _, payload in states:
            heads = _walk_strings(payload, _HEADLINE_KEYS)
            if heads:
                headline = heads[0].strip()
                break
    images: list[tuple[str, str]] = []
    seen: set[str] = set()
    for source in ([("jsonld", n) for n in jsonld] + states):
        for url, cap in _image_records(source[1]):
            if url not in seen:
                seen.add(url)
                images.append((url, cap))
    return {"headline": headline, "body": body, "images": images[:_MAX_IMAGES]}


_VISIBLE_STRIP_RE = re.compile(
    r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1>"
)
_TAG_RE = re.compile(r"(?s)<[^>]+>")


def visible_text_len(html: str) -> int:
    """Length of the tag-stripped visible text (scripts/styles/
    templates excluded) — the thin-shell signal."""
    return len(_TAG_RE.sub("", _VISIBLE_STRIP_RE.sub("", html)).strip())


def recover_csr(html: str | None, min_text_chars: int = 200) -> str | None:
    """The fetch-boundary entry point. Always promotes ``<noscript>``
    branches; when the page is a thin shell (visible text under
    ``min_text_chars``) AND a hydration/JSON-LD payload yields
    content, appends a deterministic HTML rendering of that content
    (h1 headline, paragraph body, ``<figure><img/><figcaption>`` per
    image) so every downstream stage — html→md, discovery, image
    extraction — sees it through the SAME pipeline as server-rendered
    markup. Pages with real visible text pass through with only the
    noscript promotion; the threshold is an explicit parameter, not a
    hidden heuristic."""
    if html is None:
        return None
    out = promote_noscript(html)
    if visible_text_len(out) >= min_text_chars:
        return out
    content = hydrated_content(html)
    if not (content["body"] or content["images"] or content["headline"]):
        return out
    parts = [out, "\n<!-- csr-recovered -->\n"]
    if content["headline"]:
        parts.append(f"<h1>{_esc(content['headline'])}</h1>\n")
    if content["body"]:
        body = content["body"]
        # HTML-valued payload text embeds as-is (same pipeline will
        # convert it); plain text gets paragraph wrapping
        if "<" in body and _TAG_RE.search(body):
            parts.append(body + "\n")
        else:
            for para in body.split("\n\n"):
                if para.strip():
                    parts.append(f"<p>{_esc(para.strip())}</p>\n")
    for url, cap in content["images"]:
        if cap:
            parts.append(
                f'<figure><img src="{_esc_attr(url)}">'
                f"<figcaption>{_esc(cap)}</figcaption></figure>\n"
            )
        else:
            parts.append(f'<img src="{_esc_attr(url)}">\n')
    return "".join(parts)


def _esc(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(t: str) -> str:
    return _esc(t).replace('"', "&quot;")


@pandas_udf(StringType())
def recover_csr_udf(bodies: pd.Series) -> pd.Series:
    """Arrow-batched column form of :func:`recover_csr` (default
    threshold) — one Python call per batch, usable directly on a
    fetched ``body`` column."""
    return bodies.map(lambda b: recover_csr(b) if b is not None else None)
