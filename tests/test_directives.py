"""On-page crawl directives: <meta name=robots> / X-Robots-Tag /
rel=canonical / rel=nofollow.

The reference crawls two cooperating sites and needs none of these;
an open-web crawler MUST honor them (REP meta/header extensions all
major engines document). Semantics under test: noindex keeps a page
out of the content corpus (extraction + sentences) but never out of
the pages archive or the crawl log; nofollow keeps a page's links out
of discovery; link-level rel=nofollow/ugc/sponsored strips the URL at
HTML→MD time so discovery structurally cannot see it; canonical
declarations land in an alias table (corpus-dedup signal), never
auto-enqueued. Fetchers that don't parse directives (the bare
4-column contract) make every branch a no-op — proven by the
unchanged crawl-parity suite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.html import html_to_md, page_directives, social_image
from crawler_spark.oracle.fixtures import build_world
from crawler_spark.plans.store import SnapshotStore
from crawler_spark.sources.fetch import FixtureFetcher
from crawler_spark.sources.fixtures_io import read_table, write_world
from crawler_spark.streaming.rounds import CrawlEngine

# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------


def test_meta_robots_tokens():
    html = '<html><head><meta name="robots" content="noindex, nofollow"></head></html>'
    assert page_directives(html) == (True, True, None)
    assert page_directives('<meta name="robots" content="NONE">') == (True, True, None)
    assert page_directives('<meta name="robots" content="index, follow">') == (
        False, False, None,
    )
    # most-restrictive union across multiple tags
    two = '<meta name="robots" content="noindex"><meta name="robots" content="nofollow">'
    assert page_directives(two) == (True, True, None)
    # other meta names don't trigger
    assert page_directives('<meta name="googlebot" content="noindex">') == (
        False, False, None,
    )
    # parameterized tokens ignored
    assert page_directives(
        '<meta name="robots" content="unavailable_after: 2026-01-01, noindex">'
    ) == (True, False, None)


def test_x_robots_tag_header():
    assert page_directives(None, "noindex") == (True, False, None)
    assert page_directives(None, "googlebot: noindex, nofollow") == (True, True, None)
    assert page_directives("<p>x</p>", "none") == (True, True, None)
    # header and meta union
    assert page_directives('<meta name="robots" content="nofollow">', "noindex") == (
        True, True, None,
    )


def test_directives_survive_giant_head():
    """ADVICE r4: a <head> inflated past 64 KiB by inlined CSS/JSON-LD
    must not push <meta name=robots> / <base> / og:image out of the
    scan window — the bound is the end of <head> (or first <body>),
    not a fixed byte count. The 64 KiB fallback still applies when the
    document never closes its head."""
    from crawler_spark.functions.html import base_href, social_image

    filler = "<style>" + ("x" * 100_000) + "</style>"
    html = (
        "<head>" + filler
        + '<meta name="robots" content="noindex">'
        + '<base href="/deep/">'
        + '<meta property="og:image" content="http://x/og.png">'
        + '<link rel="canonical" href="http://a.com/c">'
        + "</head><body>b</body>"
    )
    assert page_directives(html) == (True, False, "http://a.com/c")
    assert base_href(html) == "/deep/"
    assert social_image(html) == ("http://x/og.png", "")
    # body content never leaks into the head scan: a robots meta in
    # the BODY (malformed page) is outside <head> and stays ignored
    body_meta = '<head></head><body><meta name="robots" content="noindex"></body>'
    assert page_directives(body_meta) == (False, False, None)
    # unclosed head: the 64 KiB fallback window still finds early tags
    unclosed = '<meta name="robots" content="nofollow">' + "z" * 10_000
    assert page_directives(unclosed) == (False, True, None)


def test_rel_canonical_first_wins():
    html = (
        '<head><link rel="stylesheet" href="/s.css">'
        '<link rel="canonical" href="http://a.com/one">'
        '<link rel="canonical" href="http://a.com/two"></head>'
    )
    assert page_directives(html) == (False, False, "http://a.com/one")


def test_nofollow_links_keep_text_drop_url():
    md = html_to_md(
        '<p><a href="http://x/1">good</a> and '
        '<a rel="nofollow" href="http://x/2">paid</a> and '
        '<a rel="UGC noopener" href="http://x/3">comment</a> and '
        '<a rel="sponsored" href="http://x/4">ad</a></p>'
    )
    assert "[good](http://x/1)" in md
    for url, text in [("http://x/2", "paid"), ("http://x/3", "comment"),
                      ("http://x/4", "ad")]:
        assert url not in md and text in md


def test_base_href_first_wins():
    from crawler_spark.functions.html import base_href

    html = (
        '<head><base href="/deep/dir/"><base href="/ignored/">'
        "</head><body></body>"
    )
    assert base_href(html) == "/deep/dir/"
    assert base_href("<base target='_blank'>") is None
    assert base_href("<p>none</p>") is None
    assert base_href(None) is None


def test_social_image_resolution():
    # og wins over twitter regardless of document order
    html = (
        '<meta name="twitter:image" content="http://x/tw.png">'
        '<meta property="og:image" content="http://x/og.png">'
        '<meta property="og:title" content="Title">'
    )
    assert social_image(html) == ("http://x/og.png", "Title")
    # og:image:alt outranks og:title; first og:image wins
    html2 = (
        '<meta property="og:image" content="http://x/1.png">'
        '<meta property="og:image" content="http://x/2.png">'
        '<meta property="og:image:alt" content="alt text">'
        '<meta property="og:title" content="T">'
    )
    assert social_image(html2) == ("http://x/1.png", "alt text")
    # twitter-only page still resolves; name= accepted for og too
    assert social_image(
        '<meta name="twitter:image" content="http://x/t.png">'
        '<meta name="twitter:image:alt" content="tw alt">'
    ) == ("http://x/t.png", "tw alt")
    assert social_image("<p>no meta</p>") is None
    assert social_image(None) is None
    # empty content ignored
    assert social_image('<meta property="og:image" content="">') is None


# --------------------------------------------------------------------------
# engine honoring (fixture fetcher carries the directive columns)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def directive_run(spark, tmp_path_factory):
    world = build_world(n_docs=12, seed=31)
    fd = str(tmp_path_factory.mktemp("dir_world"))
    write_world(spark, world, fd)

    live = {
        r["source_url"]
        for r in world.seeds
        if world.pages.get(r["source_url"]) is not None
        and world.pages[r["source_url"]].fail_rounds == 0
    }
    # group by document: a doc seeded under several mirror URLs would
    # dilute a per-URL directive, so pick docs with exactly ONE live URL
    by_doc: dict[str, list[dict]] = {}
    for r in world.seeds:
        if r["source_url"] in live:
            by_doc.setdefault(r["document_id"], []).append(r)
    chaptered = [
        rows[0]
        for rows in by_doc.values()
        if len(rows) == 1 and rows[0]["has_chapters"]
    ]
    flat = [
        rows[0]
        for rows in by_doc.values()
        if len(rows) == 1 and not rows[0]["has_chapters"]
    ]
    assert len(chaptered) >= 2 and len(flat) >= 2
    nofollow_url = chaptered[0]["source_url"]
    control_url = chaptered[1]["source_url"]
    noindex_url = flat[0]["source_url"]
    canon_url = flat[1]["source_url"]
    canon_target = "http://example.com/THE-canonical"

    fetcher = FixtureFetcher(
        pages={
            u: (p.body, p.fail_rounds, p.latency_ms)
            for u, p in world.pages.items()
        },
        directives={
            nofollow_url: (False, True, None),
            noindex_url: (True, False, None),
            canon_url: (False, False, canon_target),
        },
        social={
            canon_url: ("http://CDN.example.com/hero.png", "the hero shot"),
            noindex_url: ("http://cdn.example.com/hidden.png", "never extracted"),
        },
    )
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, str(tmp_path_factory.mktemp("dir_store"))),
        fetcher=fetcher,
        robots=read_table(spark, fd, "robots"),
        politeness=read_table(spark, fd, "politeness"),
    )
    eng.init_frontier(read_table(spark, fd, "seeds"))
    eng.run(max_rounds=50)
    eng.build_documents()
    return eng, {
        "nofollow": nofollow_url,
        "control": control_url,
        "noindex": noindex_url,
        "canon": canon_url,
        "nofollow_doc": chaptered[0]["document_id"],
        "control_doc": chaptered[1]["document_id"],
        "noindex_doc": flat[0]["document_id"],
        "canon_target": canon_target,
    }


def test_nofollow_page_links_never_scheduled(directive_run):
    eng, u = directive_run
    frontier = eng.store.read("frontier")
    kids = {
        r["doc_id"]: r["n"]
        for r in frontier.filter(F.col("depth") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert kids.get(u["nofollow_doc"], 0) == 0  # disavowed links
    assert kids.get(u["control_doc"], 0) > 0  # control still expands


def test_noindex_archived_but_not_in_corpus(directive_run):
    eng, u = directive_run
    # archived + logged
    pages = eng.store.read("pages")
    assert pages.filter(F.col("url") == u["noindex"]).count() == 1
    assert "noindex" in pages.columns
    # no extraction rows
    assert (
        eng.extractions().filter(F.col("page_url") == u["noindex"]).count() == 0
    )
    # control noindex-free page of the same shape DID extract
    assert eng.extractions().filter(F.col("page_url") == u["canon"]).count() > 0
    # sentences exclude the noindex doc
    sents = eng.store.read("sentences")
    assert sents.filter(F.col("doc_id") == u["noindex_doc"]).count() == 0
    # but other docs are present
    assert sents.count() > 0


def test_og_image_joins_extraction_at_order_zero(directive_run):
    eng, u = directive_run
    rows = (
        eng.extractions()
        .filter(F.col("page_url") == u["canon"])
        .orderBy("img_order")
        .collect()
    )
    assert rows and rows[0]["img_order"] == 0
    # canonicalized URL (host lowercased), declared caption carried
    assert rows[0]["img_url"] == "http://cdn.example.com/hero.png"
    assert rows[0]["caption"] == "the hero shot"
    # body-discovered images follow at order >= 1
    assert all(r["img_order"] >= 1 for r in rows[1:])
    # noindex page's og row is suppressed with the rest of its content
    assert (
        eng.extractions().filter(F.col("page_url") == u["noindex"]).count() == 0
    )


def test_canonical_alias_recorded_not_enqueued(directive_run):
    eng, u = directive_run
    aliases = eng.store.read("canonical_aliases")
    rows = aliases.collect()
    assert len(rows) == 1
    assert rows[0]["url"] == u["canon"]
    # canonicalized form: host lowercases, path case preserved
    assert rows[0]["canonical_url"] == "http://example.com/THE-canonical"
    # target is a dedup signal, never a frontier row
    assert (
        eng.store.read("frontier")
        .filter(F.col("url") == rows[0]["canonical_url"])
        .count()
        == 0
    )


def test_resolve_canonical_chains(spark):
    """A→B→C→D chains collapse to the sink; mutual A⇄B pairs collapse
    to the least member; unrelated hops untouched; self-maps drop."""
    from crawler_spark.operators.dedup import resolve_canonical_chains

    rows = [
        ("http://h/a", "http://h/b"),
        ("http://h/b", "http://h/c"),
        ("http://h/c", "http://h/d"),
        ("http://h/x", "http://h/y"),  # 1-hop
        ("http://h/m1", "http://h/m2"),  # mutual pair
        ("http://h/m2", "http://h/m1"),
        ("http://h/s", "http://h/s"),  # self declaration
    ]
    df = spark.createDataFrame(rows, "url string, canonical_url string")
    got = {
        r["url"]: r["canonical"] for r in resolve_canonical_chains(df).collect()
    }
    assert got["http://h/a"] == "http://h/d"
    assert got["http://h/b"] == "http://h/d"
    assert got["http://h/c"] == "http://h/d"
    assert got["http://h/x"] == "http://h/y"
    # least member becomes the canonical: m1 self-maps (filtered), m2→m1
    assert "http://h/m1" not in got
    assert got["http://h/m2"] == "http://h/m1"
    assert "http://h/s" not in got  # self-map filtered

    # a 10-hop chain still converges
    chain = [(f"http://h/c{i}", f"http://h/c{i+1}") for i in range(9)]
    df2 = spark.createDataFrame(chain, "url string, canonical_url string")
    got2 = {
        r["url"]: r["canonical"] for r in resolve_canonical_chains(df2).collect()
    }
    assert all(v == "http://h/c9" for v in got2.values())

    # a chain FEEDING a cycle (E→D→A⇄B): every member of the cluster —
    # including the cycle nodes — gets the SAME canonical (least url,
    # since a cyclic cluster has no sink)
    df3 = spark.createDataFrame(
        [
            ("http://h/e", "http://h/d"),
            ("http://h/d", "http://h/a"),
            ("http://h/a", "http://h/b"),
            ("http://h/b", "http://h/a"),
        ],
        "url string, canonical_url string",
    )
    got3 = {
        r["url"]: r["canonical"] for r in resolve_canonical_chains(df3).collect()
    }
    assert got3 == {
        "http://h/e": "http://h/a",
        "http://h/d": "http://h/a",
        "http://h/b": "http://h/a",
    }


def test_unquoted_attribute_values_parse():
    """Unquoted attribute values are valid HTML5 and common in the
    wild — a directive parser that misses them silently indexes pages
    that opted out."""
    assert page_directives("<meta name=robots content=noindex>") == (
        True, False, None,
    )
    assert page_directives("<link rel=canonical href=http://a.com/x>") == (
        False, False, "http://a.com/x",
    )
    md = html_to_md('<a href="http://x/2" rel=nofollow>spam</a>')
    assert "http://x/2" not in md and "spam" in md
    from crawler_spark.functions.html import base_href, social_image

    assert base_href("<base href=/deep/>") == "/deep/"
    assert social_image("<meta property=og:image content=http://x/i.png>") == (
        "http://x/i.png", "",
    )
