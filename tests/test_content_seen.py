"""Content-seen dedup (Mercator second tier): URL aliases serving
identical bytes extract once; the pages archive keeps every fetch; the
guard is a provable no-op on a dup-free world."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.oracle.fixtures import build_world
from crawler_spark.sources.fetch import FixtureFetcher
from crawler_spark.sources.fixtures_io import read_table, write_world
from crawler_spark.plans.store import SnapshotStore
from crawler_spark.streaming.rounds import CrawlEngine


def _run(spark, world, fd, store_dir, **kw):
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, store_dir),
        fetcher=FixtureFetcher(
            pages={
                u: (p.body, p.fail_rounds, p.latency_ms)
                for u, p in world.pages.items()
            }
        ),
        robots=read_table(spark, fd, "robots"),
        politeness=read_table(spark, fd, "politeness"),
        **kw,
    )
    eng.init_frontier(read_table(spark, fd, "seeds"))
    eng.run(max_rounds=50)
    return eng


@pytest.fixture(scope="module")
def alias_world():
    """A world plus one ALIAS seed: a new URL serving byte-identical
    content to an existing chapterless doc."""
    world = build_world(n_docs=10, seed=17)
    import dataclasses

    orig_row = next(
        r
        for r in world.seeds
        if not r["has_chapters"]
        and r["source_type"] == "web"
        and world.pages.get(r["source_url"]) is not None
        and world.pages[r["source_url"]].fail_rounds == 0
    )
    orig = world.pages[orig_row["source_url"]]
    alias_url = f"http://{orig.host}/doc/alias_of_{orig_row['document_number']}"
    world.pages[alias_url] = dataclasses.replace(orig, url=alias_url)
    alias_row = dict(orig_row)
    alias_row["seq"] = max(r["seq"] for r in world.seeds) + 1
    alias_row["source_url"] = alias_url
    alias_row["document_id"] = "DSG_ALIAS"
    alias_row["document_number"] = 9999
    world.seeds.append(alias_row)
    return world, orig_row["source_url"], alias_url


def test_alias_extracts_once(spark, alias_world, tmp_path_factory):
    world, orig_url, alias_url = alias_world
    fd = str(tmp_path_factory.mktemp("cs_world"))
    write_world(spark, world, fd)

    off = _run(spark, world, fd, str(tmp_path_factory.mktemp("cs_off")))
    on = _run(
        spark, world, fd, str(tmp_path_factory.mktemp("cs_on")), content_seen=True
    )

    # guard OFF: both URLs extract the same images (duplicate pairs)
    pages_off = {
        r["page_url"]
        for r in off.extractions().select("page_url").distinct().collect()
    }
    assert orig_url in pages_off and alias_url in pages_off

    # guard ON: exactly one of the two extracts (deterministic winner);
    # every img_url appears under ONE page only
    pages_on = {
        r["page_url"]
        for r in on.extractions().select("page_url").distinct().collect()
    }
    assert (orig_url in pages_on) != (alias_url in pages_on)
    per_img = (
        on.extractions()
        .groupBy("img_url")
        .agg(F.countDistinct("page_url").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert per_img == 1

    # both fetches still hit the pages archive + crawl log
    archived = {
        r["url"] for r in on.store.read("pages").select("url").collect()
    }
    assert orig_url in archived and alias_url in archived
    assert "content_fp" in on.store.read("pages").columns
    logged = {r["url"] for r in on.crawl_log().select("url").collect()}
    assert orig_url in logged and alias_url in logged

    # fingerprint table is distinct
    fp = on.store.read("content_seen")
    assert fp.count() == fp.distinct().count()

    # URL-seen is untouched by the content tier
    assert alias_url in {r["url"] for r in on.url_seen().collect()}


def test_noop_on_unique_content(spark, tmp_path_factory):
    """All fixture bodies are unique → guard on/off produce identical
    extractions and crawl ordering."""
    world = build_world(n_docs=8, seed=29)
    fd = str(tmp_path_factory.mktemp("uniq_world"))
    write_world(spark, world, fd)
    off = _run(spark, world, fd, str(tmp_path_factory.mktemp("u_off")))
    on = _run(
        spark, world, fd, str(tmp_path_factory.mktemp("u_on")), content_seen=True
    )

    def ext(e):
        return {
            tuple(r)
            for r in e.extractions()
            .select("page_url", "img_url", "caption", "img_order")
            .collect()
        }

    assert ext(on) == ext(off)

    def order(e):
        return [
            tuple(r)
            for r in e.crawl_log()
            .orderBy("round", "host", "host_rank")
            .select("round", "host", "host_rank", "url")
            .collect()
        ]

    assert order(on) == order(off)
