"""Golden-oracle parity: the Spark engine must reproduce the sequential
oracle's crawl ordering, URL-seen set, and image+caption extractions
exactly (BASELINE.json north_rule correctness gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.store import SnapshotStore
from crawler_spark.sources.fetch import FixtureFetcher
from crawler_spark.sources.fixtures_io import read_table
from crawler_spark.streaming.rounds import CrawlEngine


def build_engine(spark, world, fixture_dir, tmp_path, use_bloom=False) -> CrawlEngine:
    store = SnapshotStore(spark, str(tmp_path / ("store_bloom" if use_bloom else "store")))
    fetcher = FixtureFetcher(
        pages={u: (p.body, p.fail_rounds, p.latency_ms) for u, p in world.pages.items()}
    )
    engine = CrawlEngine(
        spark=spark,
        store=store,
        fetcher=fetcher,
        robots=read_table(spark, fixture_dir, "robots"),
        politeness=read_table(spark, fixture_dir, "politeness"),
        use_bloom=use_bloom,
    )
    engine.init_frontier(read_table(spark, fixture_dir, "seeds"))
    engine.run(max_rounds=50)
    return engine


def _engine_order(engine):
    rows = (
        engine.crawl_log()
        .orderBy("round", "host", "host_rank")
        .select("round", "host", "host_rank", "url", "depth", "success", "attempt")
        .collect()
    )
    return [tuple(r) for r in rows]


def _oracle_order(oracle_result):
    return [
        (o["round"], o["host"], o["host_rank"], o["url"], o["depth"], o["success"], o["attempt"])
        for o in sorted(oracle_result.crawl_order, key=lambda o: o["seq"])
    ]


def test_crawl_ordering_exact(engine, oracle_result):
    assert _engine_order(engine) == _oracle_order(oracle_result)


def test_url_seen_set_exact(engine, oracle_result):
    got = {r["url"] for r in engine.url_seen().collect()}
    assert got == oracle_result.url_seen


def test_quarantine_count(engine, oracle_result):
    assert engine.quarantined == oracle_result.quarantined


def test_extractions_exact(engine, oracle_result):
    got = {
        (r["page_url"], r["caption"], r["img_url"], r["img_order"])
        for r in engine.extractions().collect()
    }
    want = {
        (e["page_url"], e["caption"], e["img_url"], e["img_order"])
        for e in oracle_result.extractions
    }
    assert got == want


def test_completion_flags_match(engine, oracle_result):
    got = {
        r["url"]: (r["completed"], r["attempts"])
        for r in engine.store.read("frontier").collect()
    }
    want = {e.url: (e.completed, e.attempts) for e in oracle_result.frontier}
    assert got == want


def test_metrics_match(engine, oracle_result):
    got = {
        r["round"]: (r["scheduled"], r["fetched_ok"], r["failed"], r["discovered"])
        for r in engine.store.read("metrics").collect()
    }
    want = {
        m["round"]: (m["scheduled"], m["fetched_ok"], m["failed"], m["discovered"])
        for m in oracle_result.metrics
        if m["scheduled"]
    }
    assert got == want


def test_bloom_tier_equivalent(spark, world, fixture_dir, tmp_path_factory, oracle_result):
    """Two-tier bloom dedup must be byte-identical to exact-only dedup."""
    eng = build_engine(
        spark, world, fixture_dir, tmp_path_factory.mktemp("engb"), use_bloom=True
    )
    assert _engine_order(eng) == _oracle_order(oracle_result)
    got = {r["url"] for r in eng.url_seen().collect()}
    assert got == oracle_result.url_seen


def test_resume_from_snapshot(spark, world, fixture_dir, tmp_path_factory, oracle_result):
    """Kill mid-crawl → new engine over the same store resumes and
    converges to the same final state (snapshot checkpoint resume)."""
    tmp = tmp_path_factory.mktemp("engr")
    store = SnapshotStore(spark, str(tmp / "store"))
    fetcher = FixtureFetcher(
        pages={u: (p.body, p.fail_rounds, p.latency_ms) for u, p in world.pages.items()}
    )

    def mk():
        return CrawlEngine(
            spark=spark,
            store=store,
            fetcher=fetcher,
            robots=read_table(spark, fixture_dir, "robots"),
            politeness=read_table(spark, fixture_dir, "politeness"),
        )

    e1 = mk()
    e1.init_frontier(read_table(spark, fixture_dir, "seeds"))
    for rnd in (1, 2, 3):
        e1.run_round(rnd)
    # "crash": discard e1; resume from the committed snapshots
    e2 = mk()
    assert e2.last_round() == 3
    e2.run(max_rounds=50)
    got = _engine_order(e2)
    assert got == _oracle_order(oracle_result)
    seen = {r["url"] for r in e2.url_seen().collect()}
    assert seen == oracle_result.url_seen


def test_salted_fetch_equivalent(spark, world, fixture_dir, tmp_path_factory, oracle_result):
    """Salted fetch (per-host parallel streams for dominant hosts) must
    not change any observable output — scheduling order is assigned
    before the fetch, so only task layout differs."""
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("engs") / "store"))
    fetcher = FixtureFetcher(
        pages={u: (p.body, p.fail_rounds, p.latency_ms) for u, p in world.pages.items()}
    )
    eng = CrawlEngine(
        spark=spark,
        store=store,
        fetcher=fetcher,
        robots=read_table(spark, fixture_dir, "robots"),
        politeness=read_table(spark, fixture_dir, "politeness"),
        salted_fetch=True,
    )
    eng.init_frontier(read_table(spark, fixture_dir, "seeds"))
    eng.run(max_rounds=50)
    assert _engine_order(eng) == _oracle_order(oracle_result)
    assert {r["url"] for r in eng.url_seen().collect()} == oracle_result.url_seen


def test_partition_metrics_consistent(engine):
    """Per-host partition metrics must sum to the round totals."""
    pm = engine.store.read("partition_metrics")
    per_round = {
        r["round"]: (r["s"], r["ok"])
        for r in pm.groupBy("round")
        .agg(
            F.sum("scheduled").alias("s"),
            F.sum("fetched_ok").alias("ok"),
        )
        .collect()
    }
    totals = {
        r["round"]: (r["scheduled"], r["fetched_ok"])
        for r in engine.store.read("metrics").collect()
    }
    assert per_round == totals


def test_force_recrawl_overrides(spark, world, fixture_dir, tmp_path_factory, oracle_result):
    """F4 (checkpoint.ts:24-27,159-171): force_ids re-selects completed
    checkpoints by id; force_all re-selects everything; neither
    duplicates frontier rows or rediscovers seen URLs."""
    eng = build_engine(spark, world, fixture_dir, tmp_path_factory.mktemp("engf"))
    assert eng.run_round(900).get("scheduled", 0) == 0  # drained

    frontier = eng.store.read("frontier")
    n_frontier = frontier.count()
    doc = frontier.filter(F.col("depth") == 0).select("doc_id").first()["doc_id"]
    n_doc_urls = frontier.filter(F.col("doc_id") == doc).count()

    m = eng.run_round(901, force_ids=[doc])
    assert 1 <= m["scheduled"] <= n_doc_urls
    assert m["discovered"] == 0  # all links already seen
    # every re-fetched URL belongs to the forced doc
    log = eng.crawl_log().filter(F.col("round") == 901).select("url")
    owners = log.join(frontier.select("url", "doc_id"), "url").select("doc_id").collect()
    assert {r["doc_id"] for r in owners} == {doc}

    m2 = eng.run_round(902, force_all=True)
    assert m2["scheduled"] > 0
    assert m2["discovered"] == 0
    assert eng.store.read("frontier").count() == n_frontier


def test_salted_fetch_auto_heuristic():
    """VERDICT r2 #10: "auto" salts only when the politeness budget cap
    says one host can receive a large round batch (group-overhead
    break-even, fetch.SALT_MIN_BUDGET)."""
    from crawler_spark.sources.fetch import SALT_MIN_BUDGET, resolve_salted

    assert resolve_salted(False, 10**6) is False
    assert resolve_salted(True, 1) is True
    assert resolve_salted("auto", SALT_MIN_BUDGET - 1) is False
    assert resolve_salted("auto", SALT_MIN_BUDGET) is True


def test_salted_fetch_not_coalesced_to_one_task(spark):
    """AQE sizes post-shuffle partitions by map-output BYTES, which
    cannot see per-URL fetch/parse cost — without a user-pinned
    repartition it coalesces a small round's salt groups into ONE task
    and serializes the whole fetch (measured 0.87x from salting before
    the pin). The fetch output must come from multiple partitions."""
    from pyspark.sql import functions as F

    from crawler_spark.sources.fetch import SyntheticFetcher, fetch_scheduled

    scheduled = (
        spark.range(10_000)
        .select(
            F.lit("big0").alias("host"),
            F.concat(F.lit("http://big0/p/"), F.col("id")).alias("url"),
            F.pmod(F.col("id"), F.lit(16)).cast("int").alias("host_salt"),
            F.lit(1).alias("attempt"),
        )
    )
    out = fetch_scheduled(scheduled, SyntheticFetcher(), salted=True).select(
        F.spark_partition_id().alias("pid")
    )
    n_pids = out.distinct().count()
    assert n_pids >= 4, f"salt groups coalesced into {n_pids} task(s)"
