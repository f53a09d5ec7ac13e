"""§2.11 SiteAdapter: the thanhlinh two-crawler split (one ascending
over chaptered docs, one descending over the rest — main.ts:41-72) as
two adapters alternating rounds over ONE snapshot store. Snapshot
isolation replaces the reference's lockfile; the union of their work
must converge to the same URL-seen set and completion flags as the
single default crawler (the golden oracle state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.adapters import CHAPTERED_ASC, FLAT_DESC, SiteAdapter
from crawler_spark.plans.store import SnapshotStore
from crawler_spark.sources.fetch import FixtureFetcher
from crawler_spark.sources.fixtures_io import read_table
from crawler_spark.streaming.rounds import CrawlEngine


def test_seed_filter_expr(spark):
    a = SiteAdapter(name="s0", seed_source="site0.test")
    df = spark.createDataFrame(
        [("site0.test",), ("site1.test",)], "source string"
    ).filter(a.seed_filter())
    assert [r["source"] for r in df.collect()] == ["site0.test"]


def test_two_adapters_converge_to_single_crawler_state(
    spark, world, fixture_dir, tmp_path_factory, oracle_result
):
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("eng2") / "store"))
    fetcher = FixtureFetcher(
        pages={u: (p.body, p.fail_rounds, p.latency_ms) for u, p in world.pages.items()}
    )

    def mk(adapter: SiteAdapter) -> CrawlEngine:
        return CrawlEngine(
            spark=spark,
            store=store,
            fetcher=fetcher,
            robots=read_table(spark, fixture_dir, "robots"),
            politeness=read_table(spark, fixture_dir, "politeness"),
            site_filter=adapter.frontier_filter(),
            priority_desc=adapter.priority_desc,
        )

    a = mk(CHAPTERED_ASC)
    b = mk(FLAT_DESC)
    a.init_frontier(read_table(spark, fixture_dir, "seeds"))

    rnd = 0
    idle = 0
    while idle < 2 and rnd < 120:
        rnd += 1
        eng = a if rnd % 2 else b
        m = eng.run_round(rnd)
        idle = idle + 1 if m.get("scheduled", 0) == 0 else 0

    frontier = store.read("frontier")
    assert {r["url"] for r in frontier.collect()} == oracle_result.url_seen
    got_completed = {
        r["url"] for r in frontier.filter(F.col("completed")).collect()
    }
    want_completed = {e.url for e in oracle_result.frontier if e.completed}
    assert got_completed == want_completed


# ---------------------------------------------------------------------------
# per-site cleanup chains as adapter data (VERDICT r3 #3): the
# reference's cleanupMdProcessor takes an ordered step array that
# varies per site — augustino.net/hdgmvietnam.com insert a
# footnote-label rewrite (getPageContent.ts:143-156 / :137-150),
# ktcgkpv.org runs a short verse chain, and an in-source NOTE marks
# the whitespace-before-asterisk ORDER as load-bearing. The chain is
# SiteAdapter config consumed by cleanup_chain_col.
# ---------------------------------------------------------------------------


def test_cleanup_chain_order_is_load_bearing(spark):
    """Golden that DIFFERS between the two orders: an NBSP
    (U+00A0) inside asterisk markers is only trimmed if
    normalize_whitespace has already run (the asterisk regex matches
    ASCII spaces only) — exactly why the reference NOTE pins the
    order. Both chains are pure adapter data."""
    from crawler_spark.functions.text import STANDARD_CLEANUP_CHAIN, cleanup_chain

    text = "và *\u00a0quan trọng\u00a0* hơn"  # NBSPs explicit
    swapped = list(STANDARD_CLEANUP_CHAIN)
    i = swapped.index("normalize_whitespace")
    j = swapped.index("normalize_asterisk")
    swapped[i], swapped[j] = swapped[j], swapped[i]

    std_golden = "và *quan trọng* hơn"
    alt_golden = "và * quan trọng*  hơn"
    assert cleanup_chain(text, STANDARD_CLEANUP_CHAIN) == std_golden
    assert cleanup_chain(text, tuple(swapped)) == alt_golden
    assert std_golden != alt_golden

    # the Column side honors the same adapter-config order
    std_adapter = SiteAdapter(name="std")  # None -> standard chain
    alt_adapter = SiteAdapter(name="alt", cleanup_chain=tuple(swapped))
    df = spark.createDataFrame([(text,)], "text string").select(
        std_adapter.cleanup("text").alias("std"),
        alt_adapter.cleanup("text").alias("alt"),
    )
    row = df.collect()[0]
    assert row["std"] == std_golden
    assert row["alt"] == alt_golden


def test_footnote_chain_matches_reference_formats(spark):
    """augustino.net's extra step: footnote links collapse to their
    label BEFORE whitespace normalization. Formats from the
    reference's own NOTE (getPageContent.ts:138-141); the label is
    the 2nd capturing group, mirroring the JS callback's props[1]."""
    from crawler_spark.adapters import AUGUSTINO
    from crawler_spark.functions.text import FOOTNOTE_CLEANUP_CHAIN, cleanup_chain

    cases = [
        ("xem [\\[3\\]](#footnote-link) nhé", "xem [3] nhé"),
        ("xem [**\\[7\\]**](#footnote-link) xong", "xem [7] xong"),
    ]
    for src, want in cases:
        assert cleanup_chain(src, FOOTNOTE_CLEANUP_CHAIN) == want
    # the standard chain does NOT collapse footnotes (remove_md_links
    # has already run before the label step would matter)
    assert AUGUSTINO.cleanup_chain == FOOTNOTE_CLEANUP_CHAIN

    df = spark.createDataFrame([(c[0],) for c in cases], "text string").select(
        AUGUSTINO.cleanup("text").alias("out")
    )
    assert [r["out"] for r in df.collect()] == [c[1] for c in cases]


def test_verse_chain_skips_structural_steps(spark):
    """ktcgkpv.org's verse chain has no imgs/links/hr steps: an image
    ref must SURVIVE it but vanish under the standard chain."""
    from crawler_spark.adapters import KTCGKPV_VERSES
    from crawler_spark.functions.text import (
        STANDARD_CLEANUP_CHAIN,
        VERSE_CLEANUP_CHAIN,
        cleanup_chain,
    )

    text = "Câu ![alt](http://img) với  hai   khoảng"
    verse_out = cleanup_chain(text, VERSE_CLEANUP_CHAIN)
    std_out = cleanup_chain(text, STANDARD_CLEANUP_CHAIN)
    assert "![alt](http://img)" in verse_out
    assert "![alt]" not in std_out
    df = spark.createDataFrame([(text,)], "text string").select(
        KTCGKPV_VERSES.cleanup("text").alias("out")
    )
    assert df.collect()[0]["out"] == verse_out


def test_engine_treegen_honors_adapter_chain(spark):
    """The engine's sentence/heading build consumes the adapter's
    cleanup chain: the same page body cleans differently under the
    standard vs a swapped (asterisk-before-whitespace) order, and
    build_sentence_tables reflects the configured order."""
    from crawler_spark.functions.text import STANDARD_CLEANUP_CHAIN
    from crawler_spark.operators.treegen import build_sentence_tables

    body = "# Tiêu đề\n\nvà * quan trọng * hơn."
    pages = spark.createDataFrame(
        [("u1", "d1", 1, 1, body)],
        "url string, doc_id string, document_number int, depth int, body string",
    )
    swapped = list(STANDARD_CLEANUP_CHAIN)
    i = swapped.index("normalize_whitespace")
    j = swapped.index("normalize_asterisk")
    swapped[i], swapped[j] = swapped[j], swapped[i]

    std_sent, _, _ = build_sentence_tables(pages)
    alt_sent, _, _ = build_sentence_tables(pages, cleanup_chain=tuple(swapped))
    std_txt = " ".join(r["text"] for r in std_sent.orderBy("sentence_num").collect())
    alt_txt = " ".join(r["text"] for r in alt_sent.orderBy("sentence_num").collect())
    assert "*quan trọng*" in std_txt
    assert std_txt != alt_txt
