"""Sitemap-protocol ingestion (sitemaps.org / RFC 9309 §2.2.4 cross-ref).

The reference discovers URLs only by walking listing pages
(`src/lib/crawler/crawler.ts:219-276`); real sites publish the same
inventory up front in sitemap.xml, so the graft adds it as a frontier
*discovery source*: robots.txt `Sitemap:` directives (see
`operators/robots.py:sitemap_seeds`) → fetch → parse → either more
sitemaps (a <sitemapindex>) or page URLs (a <urlset>) with lastmod /
changefreq / priority hints that seed the revisit scheduler and the
politeness priority key.

Physical shape: parsing is one JVM projection per sitemap row —
`regexp_extract_all` over the body, no Python, no exchange; a sitemap
is ≤ 50 MB / 50,000 URLs by spec, so per-row cost is bounded. The only
Python is an Arrow-batched gunzip for `.xml.gz` payloads (bytes →
bytes; a sitemap body is opaque binary until decompressed — there is
no JVM gunzip expression). Index recursion is a bounded driver loop
(depth ≤ `max_depth`, one round per level) exactly like the engine's
crawl rounds — never per-row recursion.

XML handling is deliberately a grammar SUBSET: well-formed sitemaps
use a fixed, flat element vocabulary, so `<url>…</url>` block
extraction + per-field tag extraction with optional namespace prefixes
covers the protocol; the five XML entities and decimal/hex character
references are decoded JVM-side. Documents that interleave CDATA or
exotic markup fall back to null fields, never to wrong rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# <url>…</url> or <sitemap>…</sitemap> blocks, optional ns prefix on
# every tag. DOTALL via (?s); non-greedy so blocks never merge.
_BLOCK_RX = r"(?s)<(?:[A-Za-z0-9_.-]+:)?{tag}\s*>(.*?)</(?:[A-Za-z0-9_.-]+:)?{tag}\s*>"
_FIELD_RX = (
    r"(?s)<(?:[A-Za-z0-9_.-]+:)?{tag}\s*>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*"
    r"</(?:[A-Za-z0-9_.-]+:)?{tag}\s*>"
)

_GZIP_MAGIC = b"\x1f\x8b"


@pandas_udf(T.BinaryType())
def gunzip_bytes(col: pd.Series) -> pd.Series:
    """Arrow-batched gunzip; non-gzip bytes pass through untouched, a
    corrupt gzip stream yields null (the row quarantines downstream)."""
    import zlib

    out = []
    for b in col:
        if b is None:
            out.append(None)
        elif bytes(b[:2]) == _GZIP_MAGIC:
            try:
                out.append(zlib.decompress(bytes(b), 16 + zlib.MAX_WBITS))
            except zlib.error:
                out.append(None)
        else:
            out.append(bytes(b))
    return pd.Series(out)


# the sitemap spec (sitemaps.org "escaping") requires exactly these
# five characters be escaped in <loc>; decode each in named, decimal
# and hex reference form. &/&amp; decodes LAST or '&amp;lt;' would
# double-decode. 15 tiny literal replaces ≪ one regex scan each; kept
# literal (F.replace) so codegen stays small.
_ENTITY_FORMS: list[tuple[str, list[str]]] = [
    ("<", ["&lt;", "&#60;", "&#x3c;", "&#x3C;"]),
    (">", ["&gt;", "&#62;", "&#x3e;", "&#x3E;"]),
    ('"', ["&quot;", "&#34;", "&#x22;"]),
    ("'", ["&apos;", "&#39;", "&#x27;"]),
    ("&", ["&amp;", "&#38;", "&#x26;"]),
]


def _unescape_xml(c: Column) -> Column:
    for ch, forms in _ENTITY_FORMS:
        for form in forms:
            c = F.replace(c, F.lit(form), F.lit(ch))
    return c


def _blocks(body: Column, tag: str) -> Column:
    return F.regexp_extract_all(body, F.lit(_BLOCK_RX.format(tag=tag)), F.lit(1))


def _field(block: Column, tag: str) -> Column:
    v = F.regexp_extract(block, _FIELD_RX.format(tag=tag), 1)
    return F.when(v != "", _unescape_xml(F.trim(v)))


def parse_sitemap(
    fetched: DataFrame,
    body_col: str = "body",
    url_col: str = "sitemap_url",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(sitemap_url, body[, …]) → one row per referenced URL.

    Output: (sitemap_url, kind, loc, lastmod, changefreq, priority)
    where kind='index' rows are child sitemaps to fetch next round and
    kind='url' rows are page candidates. Bodies may be gzip (binary) or
    plain text; pass bytes through :func:`gunzip_bytes` first when the
    source is `.xml.gz`.
    """
    body = F.coalesce(F.col(body_col).cast("string"), F.lit(""))
    urls = F.transform(
        _blocks(body, "url"),
        lambda b: F.struct(
            F.lit("url").alias("kind"),
            _field(b, "loc").alias("loc"),
            _field(b, "lastmod").alias("lastmod"),
            _field(b, "changefreq").alias("changefreq"),
            _field(b, "priority").cast("double").alias("priority"),
        ),
    )
    subs = F.transform(
        _blocks(body, "sitemap"),
        lambda b: F.struct(
            F.lit("index").alias("kind"),
            _field(b, "loc").alias("loc"),
            _field(b, "lastmod").alias("lastmod"),
            F.lit(None).cast("string").alias("changefreq"),
            F.lit(None).cast("double").alias("priority"),
        ),
    )
    entries = F.filter(F.concat(urls, subs), lambda e: e["loc"].isNotNull())
    return fetched.select(
        F.col(url_col).alias("sitemap_url"),
        *keep_cols,
        F.explode(entries).alias("e"),
    ).select(
        "sitemap_url",
        *keep_cols,
        F.col("e.kind").alias("kind"),
        F.col("e.loc").alias("loc"),
        F.to_timestamp(F.col("e.lastmod")).alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.col("e.priority").alias("priority"),
    )


def expand_sitemaps(
    spark,
    seeds: DataFrame,
    fetcher,
    max_depth: int = 3,
    max_sitemaps_per_round: int = 10_000,
) -> DataFrame:
    """Bounded driver loop: fetch the seed sitemaps, parse, recurse
    into <sitemapindex> children (cycle-safe — each round anti-joins
    already-fetched sitemap URLs), accumulate <urlset> rows.

    ``seeds``: (host, sitemap_url) — from robots `Sitemap:` directives.
    ``fetcher``: any fetch_batch object from `sources/fetch.py`; bodies
    it returns are strings (the HTTP layer already gunzips
    Content-Encoding; file-level `.xml.gz` should be routed through
    :func:`gunzip_bytes` by the caller's fetcher).
    Returns (host, loc, lastmod, changefreq, priority, sitemap_url).
    """
    from crawler_spark.sources.fetch import fetch_scheduled

    seen = seeds.select("host", F.col("sitemap_url").alias("url")).dropDuplicates(
        ["url"]
    )
    frontier = seen
    pages = None
    for _depth in range(max_depth):
        if frontier.isEmpty():
            break
        batch = frontier.limit(max_sitemaps_per_round)
        fetched = fetch_scheduled(batch, fetcher).filter(F.col("success"))
        parsed = parse_sitemap(
            fetched.withColumnRenamed("url", "sitemap_url"),
            body_col="body",
            keep_cols=("host",),
        )
        urls = parsed.filter(F.col("kind") == "url").select(
            "host", "loc", "lastmod", "changefreq", "priority", "sitemap_url"
        )
        pages = urls if pages is None else pages.unionByName(urls)
        children = (
            parsed.filter(F.col("kind") == "index")
            .select("host", F.col("loc").alias("url"))
            .dropDuplicates(["url"])
            .join(seen, "url", "left_anti")
        )
        # localCheckpoint: each round's frontier/seen otherwise chains
        # the whole fetch lineage (same trick as the CC operator)
        frontier = children.localCheckpoint(eager=True)
        seen = seen.unionByName(frontier).localCheckpoint(eager=True)
    if pages is None:
        pages = spark.createDataFrame(
            [],
            "host string, loc string, lastmod timestamp, changefreq string, "
            "priority double, sitemap_url string",
        )
    return pages.dropDuplicates(["loc"])
