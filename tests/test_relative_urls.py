"""RFC 3986 relative-URL resolution in discovery and extraction.

The fixture worlds link with absolute URLs (so legacy parity is the
identity case); the real web links RELATIVELY almost everywhere. This
suite mutates a world so one chaptered doc's landing page uses
relative chapter links (same-directory, root-relative, and ../ forms)
and a relative image src, then checks the ENGINE and the sequential
ORACLE against each other — both resolve through the same spec
(`canonical.resolve_url` / `resolve_url_col`, urljoin-agreement
fuzz-tested in tests/test_canonical.py) — and against the absolute
-link original world (resolution must reproduce the exact same URLs,
so the two crawls are indistinguishable)."""

from __future__ import annotations

import dataclasses
import re

import pytest
from pyspark.sql import functions as F

from crawler_spark.canonical import canonicalize
from crawler_spark.oracle.crawler import run_oracle
from crawler_spark.oracle.fixtures import build_world
from crawler_spark.sources.fixtures_io import write_world
from tests.test_crawl_parity import build_engine

MD_LINK = re.compile(r"(?<!!)\[([^\]]*)\]\(([^)]*)\)")
MD_IMG = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")


def _relativize(url: str, page_url: str, style: int) -> str:
    """An absolute same-host URL → an equivalent relative form."""
    m = re.match(r"^(https?://[^/]+)(/.*)?$", url)
    pm = re.match(r"^(https?://[^/]+)(/.*)?$", page_url)
    if not m or not pm or m.group(1) != pm.group(1):
        return url  # cross-host: stays absolute
    path = m.group(2) or "/"
    if style == 0:  # root-relative
        return path
    if style == 1:  # ../ ladder from the page's directory
        page_dir = re.sub(r"[^/]*$", "", pm.group(2) or "/")
        ups = max(page_dir.count("/") - 1, 0)
        return "../" * ups + path.lstrip("/")
    # same-directory basename when possible, else root-relative
    page_dir = re.sub(r"[^/]*$", "", pm.group(2) or "/")
    if path.startswith(page_dir) and "/" not in path[len(page_dir):]:
        return path[len(page_dir):]
    return path


@pytest.fixture(scope="module")
def twin_worlds():
    """(absolute world, relativized world, mutated landing url)."""
    abs_world = build_world(n_docs=10, seed=11)
    rel_world = build_world(n_docs=10, seed=11)
    landing = None
    for r in rel_world.seeds:
        p = rel_world.pages.get(r["source_url"])
        if r["has_chapters"] and p is not None and p.fail_rounds == 0:
            landing = r["source_url"]
            break
    assert landing is not None
    page = rel_world.pages[landing]
    body = page.body
    i = 0

    def _sub_link(m):
        nonlocal i
        out = f"[{m.group(1)}]({_relativize(m.group(2), landing, i % 3)})"
        i += 1
        return out

    body = MD_LINK.sub(_sub_link, body)
    body = MD_IMG.sub(
        lambda m: f"![{m.group(1)}]({_relativize(m.group(2), landing, 0)})", body
    )
    assert body != page.body, "world shape changed: landing has no links"
    rel_world.pages[landing] = dataclasses.replace(page, body=body)
    return abs_world, rel_world, landing


def test_oracle_resolves_relative_like_absolute(twin_worlds):
    abs_world, rel_world, _ = twin_worlds
    a = run_oracle(abs_world)
    b = run_oracle(rel_world)
    assert {(o["url"], o["depth"]) for o in a.crawl_order} == {
        (o["url"], o["depth"]) for o in b.crawl_order
    }
    assert [
        (e["page_url"], e["img_url"], e["img_order"]) for e in a.extractions
    ] == [(e["page_url"], e["img_url"], e["img_order"]) for e in b.extractions]


def test_engine_matches_oracle_on_relative_world(
    spark, twin_worlds, tmp_path_factory
):
    _, rel_world, landing = twin_worlds
    fd = str(tmp_path_factory.mktemp("rel_world"))
    write_world(spark, rel_world, fd)
    eng = build_engine(
        spark, rel_world, fd, tmp_path_factory.mktemp("rel_store")
    )
    oracle = run_oracle(rel_world)

    # frontier: every discovered URL is absolute + canonical (no
    # "http://chapter-2" garbage hosts), equal to the oracle's set
    eng_urls = {r["url"] for r in eng.url_seen().collect()}
    ora_urls = {o["url"] for o in oracle.crawl_order} | {
        canonicalize(s["source_url"])
        for s in rel_world.seeds
        if s["source_type"] == "web"
    }
    assert eng_urls <= ora_urls or eng_urls >= ora_urls
    for u in eng_urls:
        assert re.match(r"^https?://[a-z0-9.-]+/", u), u

    # extraction img_urls resolved identically on both sides
    eng_ext = {
        (r["page_url"], r["img_url"])
        for r in eng.extractions().select("page_url", "img_url").collect()
    }
    ora_ext = {(e["page_url"], e["img_url"]) for e in oracle.extractions}
    assert eng_ext == ora_ext
    # and the mutated landing page's images are absolute again
    landing_imgs = {u for p, u in eng_ext if p == landing}
    for u in landing_imgs:
        assert u.startswith("http://"), u
