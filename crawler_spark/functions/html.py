"""C16 HTML→Markdown (`src/lib/md/remark.ts:9-26`).

The reference converts fetched HTML to markdown through a unified
pipeline (rehype-parse → remove comments → rehype-remark → gfm →
smartypants → stringify). A full CommonMark engine is out of scope;
this module defines a *deterministic* subset converter covering the
constructs the crawled sites emit (headings, paragraphs, emphasis,
links, images, lists, blockquotes, breaks; script/style/comment
removal; entity unescape) with one spec and two surfaces:

  * :func:`html_to_md` — pure Python (oracle mirror, also usable
    inside any pandas UDF);
  * :func:`html_to_md_udf` — an Arrow-batched ``pandas_udf`` (the
    no-per-row-Python boundary rule: one Python call per batch, string
    work vectorized per batch via ``Series.map`` of a compiled
    pipeline).

Order of operations matters and is part of the spec: strip
script/style/comments first (their content must never leak), convert
block constructs, then inline ones, then drop remaining tags, then
unescape entities (so entity-encoded markup stays literal text).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_HEAD_RE = re.compile(r"(?is)<h([1-6])\b[^>]*>(.*?)</h\1>")
_P_RE = re.compile(r"(?is)<p\b[^>]*>(.*?)</p>")
_BR_RE = re.compile(r"(?i)<br\s*/?>")
_STRONG_RE = re.compile(r"(?is)<(?:strong|b)\b[^>]*>(.*?)</(?:strong|b)>")
_EM_RE = re.compile(r"(?is)<(?:em|i)\b[^>]*>(.*?)</(?:em|i)>")
_A_RE = re.compile(r"(?is)<a\b[^>]*?href=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>")
_IMG_RE = re.compile(
    r"(?is)<img\b[^>]*?src=[\"']([^\"']*)[\"'][^>]*?(?:alt=[\"']([^\"']*)[\"'][^>]*?)?/?>"
)
_IMG_ALT_FIRST_RE = re.compile(
    r"(?is)<img\b[^>]*?alt=[\"']([^\"']*)[\"'][^>]*?src=[\"']([^\"']*)[\"'][^>]*?/?>"
)
_LI_RE = re.compile(r"(?is)<li\b[^>]*>(.*?)</li>")
_BQ_RE = re.compile(r"(?is)<blockquote\b[^>]*>(.*?)</blockquote>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
    "&hellip;": "…",
    "&ndash;": "–",
    "&mdash;": "—",
}


def _unescape(t: str) -> str:
    for k, v in _ENTITIES.items():
        t = t.replace(k, v)
    return re.sub(r"&#(\d+);", lambda m: chr(int(m.group(1))), t)


def html_to_md(html: str) -> str:
    t = _SCRIPT_RE.sub("", html)
    t = _COMMENT_RE.sub("", t)
    # block constructs
    t = _HEAD_RE.sub(lambda m: "\n\n" + "#" * int(m.group(1)) + " " + m.group(2).strip() + "\n\n", t)
    t = _BQ_RE.sub(lambda m: "\n\n> " + m.group(1).strip() + "\n\n", t)
    t = _LI_RE.sub(lambda m: "\n- " + m.group(1).strip(), t)
    t = _P_RE.sub(lambda m: "\n\n" + m.group(1).strip() + "\n\n", t)
    t = _BR_RE.sub("\n", t)
    # inline constructs (image before link: <img> has no closing </a> clash)
    t = _IMG_ALT_FIRST_RE.sub(lambda m: f"![{m.group(1)}]({m.group(2)})", t)
    t = _IMG_RE.sub(lambda m: f"![{m.group(2) or ''}]({m.group(1)})", t)
    t = _A_RE.sub(lambda m: f"[{m.group(2).strip()}]({m.group(1)})", t)
    t = _STRONG_RE.sub(lambda m: f"**{m.group(1).strip()}**", t)
    t = _EM_RE.sub(lambda m: f"*{m.group(1).strip()}*", t)
    # drop everything else, then entities
    t = _TAG_RE.sub("", t)
    t = _unescape(t)
    t = re.sub(r"[ \t]+\n", "\n", t)
    t = re.sub(r"\n{3,}", "\n\n", t)
    return t.strip()


@pandas_udf(StringType())  # DataType object: no active-session DDL parse at import
def html_to_md_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched conversion — one Python invocation per batch."""
    return s.map(lambda x: html_to_md(x) if x is not None else None)
