"""Engine integration for robots.txt-text config + sitemap admission.

Parity gate: an engine configured from PARSED robots.txt bodies must
produce the exact same crawl ordering and URL-seen set as the engine
built from the pre-constructed rules table (which test_crawl_parity
pins against the sequential oracle). Then sitemap-discovered URLs go
through `enqueue_discovered` and the standard admission chain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.oracle.fixtures import build_world
from crawler_spark.sources.fetch import FixtureFetcher
from crawler_spark.sources.fixtures_io import read_table, write_world
from crawler_spark.plans.store import SnapshotStore
from crawler_spark.streaming.rounds import CrawlEngine


@pytest.fixture(scope="module")
def small_world():
    return build_world(n_docs=10, seed=11)


@pytest.fixture(scope="module")
def small_dir(spark, small_world, tmp_path_factory):
    d = tmp_path_factory.mktemp("disc_world")
    write_world(spark, small_world, str(d))
    return str(d)


def _engine(spark, world, fixture_dir, store_dir, robots_df, politeness_df):
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, store_dir),
        fetcher=FixtureFetcher(
            pages={
                u: (p.body, p.fail_rounds, p.latency_ms)
                for u, p in world.pages.items()
            }
        ),
        robots=robots_df,
        politeness=politeness_df,
    )
    eng.init_frontier(read_table(spark, fixture_dir, "seeds"))
    eng.run(max_rounds=50)
    return eng


def _order(eng):
    return [
        tuple(r)
        for r in eng.crawl_log()
        .orderBy("round", "host", "host_rank")
        .select("round", "host", "host_rank", "url", "depth", "success")
        .collect()
    ]


def test_robots_txt_config_parity(spark, small_world, small_dir, tmp_path_factory):
    """robots.txt TEXT equivalent of the world's rules table drives the
    engine to an identical crawl."""
    hosts = sorted({r["host"] for r in small_world.robots})
    bodies = spark.createDataFrame(
        [
            (
                h,
                "# generated twin of the fixture rules\n"
                "User-agent: sparkbot\n"
                "Allow: /\n"
                "Disallow: /private\n"
                "Crawl-delay: 0.1\n",  # 60/0.1=600 ≫ budgets → no-op
            )
            for h in hosts
        ],
        "host string, body string",
    )
    politeness = read_table(spark, small_dir, "politeness")
    rules, budgets, maps = CrawlEngine.robots_config(
        bodies, politeness, agent="sparkbot", round_period_s=60.0
    )
    assert maps.count() == 0  # no Sitemap: directives in these bodies

    base = _engine(
        spark,
        small_world,
        small_dir,
        str(tmp_path_factory.mktemp("base_store")),
        read_table(spark, small_dir, "robots"),
        politeness,
    )
    from_text = _engine(
        spark,
        small_world,
        small_dir,
        str(tmp_path_factory.mktemp("text_store")),
        rules,
        budgets,
    )
    assert _order(from_text) == _order(base)
    seen_a = {r["url"] for r in base.url_seen().collect()}
    seen_b = {r["url"] for r in from_text.url_seen().collect()}
    assert seen_a == seen_b


def test_crawl_delay_throttles_budget(spark, small_world, small_dir, tmp_path_factory):
    """A long Crawl-delay must shrink a host's per-round budget: the
    throttled engine visits the same URLs, spread over MORE rounds."""
    hosts = sorted({r["host"] for r in small_world.robots})
    politeness = read_table(spark, small_dir, "politeness")
    bodies = spark.createDataFrame(
        [
            (
                h,
                "User-agent: *\nAllow: /\nDisallow: /private\nCrawl-delay: 60\n",
            )
            for h in hosts
        ],
        "host string, body string",
    )
    rules, budgets, _ = CrawlEngine.robots_config(
        bodies, politeness, round_period_s=60.0
    )
    got = {r["host"]: r["budget_per_round"] for r in budgets.collect()}
    assert all(v == 1 for v in got.values())  # floor(60/60) = 1

    base = _engine(
        spark,
        small_world,
        small_dir,
        str(tmp_path_factory.mktemp("b2")),
        read_table(spark, small_dir, "robots"),
        politeness,
    )
    slow = _engine(
        spark, small_world, small_dir, str(tmp_path_factory.mktemp("s2")), rules, budgets
    )
    seen_base = {r["url"] for r in base.url_seen().collect()}
    seen_slow = {r["url"] for r in slow.url_seen().collect()}
    assert seen_base == seen_slow
    assert slow.last_round() >= base.last_round()
    # throttle respected: never more than 1 fetch per host per round
    per_round = (
        slow.crawl_log()
        .groupBy("round", "host")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_round == 1


def test_enqueue_discovered_admission(spark, small_world, small_dir, tmp_path_factory):
    """Sitemap URLs pass the same admission chain as link discovery:
    robots drops /private, the anti-join drops already-seen URLs, and
    admitted rows carry the priority→document_number mapping."""
    politeness = read_table(spark, small_dir, "politeness")
    eng = _engine(
        spark,
        small_world,
        small_dir,
        str(tmp_path_factory.mktemp("enq")),
        read_table(spark, small_dir, "robots"),
        politeness,
    )
    host = sorted({r["host"] for r in small_world.robots})[0]
    seen_url = next(iter(small_world.pages))  # any crawled URL is seen
    cand = spark.createDataFrame(
        [
            (f"https://{host}/private/secret", 0.9),
            (seen_url, 0.9),
            (f"https://{host}/sm-page-1", 0.9),
            (f"https://{host}/sm-page-2", None),
        ],
        "url string, priority double",
    )
    before = eng.store.read("frontier").count()
    n = eng.enqueue_discovered(cand, site="sitemap", rnd=eng.last_round())
    assert n == 2
    frontier = eng.store.read("frontier")
    assert frontier.count() == before + 2
    rows = {
        r["url"]: r
        for r in frontier.filter(F.col("site") == "sitemap").collect()
    }
    assert set(rows) == {
        f"https://{host}/sm-page-1",
        f"https://{host}/sm-page-2",
    }
    r1 = rows[f"https://{host}/sm-page-1"]
    assert r1["doc_id"].startswith("sm:") and r1["depth"] == 0
    assert r1["document_number"] == 100  # (1-0.9)*1000
    assert rows[f"https://{host}/sm-page-2"]["document_number"] == 500  # default
    # re-enqueueing the same candidates admits nothing (now seen)
    assert eng.enqueue_discovered(cand, site="sitemap", rnd=eng.last_round()) == 0
