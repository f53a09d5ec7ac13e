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
