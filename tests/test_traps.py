"""Crawl-trap guards: heuristic agreement (JVM vs python twin), the
per-host admission cap's plan shape, and engine integration — trap URLs
quarantine with reasons, clean crawls are bit-identical with the guard
on or off."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.traps import (
    cap_admissions_per_host,
    trap_filter,
    trap_reason_col,
    trap_reasons,
)

CASES = [
    # (url, expected reasons)
    ("http://a.test/doc/1", []),
    ("http://a.test/" + "/".join(f"s{i}" for i in range(16)), []),  # deep but ≤16
    ("http://a.test/" + "/".join(f"s{i}" for i in range(17)), ["too_deep"]),
    ("http://a.test/x?" + "&".join(f"k{i}=v" for i in range(10)), []),
    ("http://a.test/x?" + "&".join(f"k{i}=v" for i in range(11)), ["query_blowup"]),
    ("http://a.test/loop/loop/loop", ["repeated_segment"]),
    ("http://a.test/a/b/a/b", []),  # two-segment alternation is legitimate
    ("http://a.test/p;jsessionid=AB12", ["session_alias"]),
    ("http://a.test/p?phpsessid=zz", ["session_alias"]),
    ("http://a.test/p?sidebar=1", []),  # 'sid' must match the whole key
    ("http://a.test/cal/1/2/3/4/5/6", ["calendar"]),
    ("http://a.test/arch/2026/08/19", []),  # short date paths are fine
    ("http://a.test/" + "q" * 2050, ["too_long"]),
    # compound: both fire, reason order is canonical
    (
        "http://a.test/loop/loop/loop;jsessionid=AB12",
        ["repeated_segment", "session_alias"],
    ),
]


def test_python_twin_cases():
    for url, want in CASES:
        assert trap_reasons(url) == want, url


def test_jvm_matches_python_twin(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {
        r["url"]: r["reason"]
        for r in df.withColumn("reason", trap_reason_col("url")).collect()
    }
    for url, want in CASES:
        assert got[url] == ",".join(want), url


def test_trap_filter_split(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    clean, trapped = trap_filter(df)
    n_bad = sum(1 for _, w in CASES if w)
    assert clean.count() == len(CASES) - n_bad
    assert trapped.count() == n_bad
    assert "trap_reason" in trapped.columns


def test_cap_admissions_deterministic_and_partial(spark):
    rows = [(f"h{i % 5}.test", f"http://h{i % 5}.test/p{i:03d}", i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "host string, url string, document_number int")
    admitted, deferred = cap_admissions_per_host(
        df, 3, order_cols=["document_number", "url"]
    )
    assert admitted.count() == 15 and deferred.count() == 185
    per_host = admitted.groupBy("host").count().collect()
    assert all(r["count"] == 3 for r in per_host)
    # deterministic: the kept set is the per-host min-(doc_num, url) triple
    got = sorted(r["url"] for r in admitted.collect())
    want = sorted(
        u
        for h in {r[0] for r in rows}
        for _, u in sorted(
            (dn, u) for hh, u, dn in rows if hh == h
        )[:3]
    )
    assert got == want
    # constant rank bound → partial WindowGroupLimit BEFORE the host
    # exchange (same gate as politeness): the shuffle carries
    # O(hosts × cap), not the trap host's millions
    plan = admitted._jdf.queryExecution().executedPlan().toString()
    partials = [
        b for b in plan.split("\n\n") if "WindowGroupLimit" in b and "Partial" in b
    ]
    assert partials, "no partial WindowGroupLimit before the admission-cap shuffle"


# ----------------------------------------------------------------- engine
@pytest.fixture(scope="module")
def trap_world():
    from crawler_spark.oracle.fixtures import build_world

    world = build_world(n_docs=10, seed=7)
    # salt ONE chaptered landing page with trap-shaped + clean links;
    # only depth-0 chaptered pages feed discovery
    victim = next(
        u
        for u, p in world.pages.items()
        if "/ch_" not in u and f"{u}/ch_1_p" in world.pages
    )
    host = world.pages[victim].host
    # each link needs a DISTINCT derived key (split('_').at(-2)) or the
    # engine's D2 per-page dedup collapses them before the guard runs
    extra = [
        f"- [loop](http://{host}/loop/loop/loop/z_t1_x)",
        f"- [sess](http://{host}/p_t2_x;jsessionid=AB12)",
        f"- [cal](http://{host}/c/1/2/3/4/5/6/z_t3_x)",
        f"- [ok](http://{host}/doc/extra_t9_ok)",
    ]
    world.pages[victim].body += "\n" + "\n".join(extra)
    return world, victim, host


def _run_engine(spark, world, fixture_dir, store_dir, **kw):
    from crawler_spark.sources.fetch import FixtureFetcher
    from crawler_spark.sources.fixtures_io import read_table
    from crawler_spark.plans.store import SnapshotStore
    from crawler_spark.streaming.rounds import CrawlEngine

    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, store_dir),
        fetcher=FixtureFetcher(
            pages={
                u: (p.body, p.fail_rounds, p.latency_ms)
                for u, p in world.pages.items()
            }
        ),
        robots=read_table(spark, fixture_dir, "robots"),
        politeness=read_table(spark, fixture_dir, "politeness"),
        **kw,
    )
    eng.init_frontier(read_table(spark, fixture_dir, "seeds"))
    eng.run(max_rounds=50)
    return eng


def test_engine_quarantines_traps(spark, trap_world, tmp_path_factory):
    from crawler_spark.sources.fixtures_io import write_world

    world, victim, host = trap_world
    fd = str(tmp_path_factory.mktemp("trap_world"))
    write_world(spark, world, fd)
    eng = _run_engine(
        spark, world, fd, str(tmp_path_factory.mktemp("trap_store")), trap_guard=True
    )
    q = {
        r["url"]: r["trap_reason"]
        for r in eng.store.read("trap_quarantine").collect()
    }
    assert q == {
        f"http://{host}/loop/loop/loop/z_t1_x": "repeated_segment",
        f"http://{host}/p_t2_x;jsessionid=AB12": "session_alias",
        f"http://{host}/c/1/2/3/4/5/6/z_t3_x": "calendar",
    }
    frontier_urls = {r["url"] for r in eng.store.read("frontier").collect()}
    assert not (set(q) & frontier_urls)
    # the clean extra link was admitted normally
    assert f"http://{host}/doc/extra_t9_ok" in frontier_urls


def test_guard_is_noop_on_clean_world(spark, tmp_path_factory):
    """Golden-parity safety: with no trap-shaped URLs, guard on/off
    produce identical crawl logs and URL-seen sets."""
    from crawler_spark.oracle.fixtures import build_world
    from crawler_spark.sources.fixtures_io import write_world

    world = build_world(n_docs=8, seed=13)
    fd = str(tmp_path_factory.mktemp("clean_world"))
    write_world(spark, world, fd)
    off = _run_engine(spark, world, fd, str(tmp_path_factory.mktemp("off")))
    on = _run_engine(
        spark, world, fd, str(tmp_path_factory.mktemp("on")),
        trap_guard=True, admit_cap_per_host=1000,
    )

    def order(e):
        return [
            tuple(r)
            for r in e.crawl_log()
            .orderBy("round", "host", "host_rank")
            .select("round", "host", "host_rank", "url")
            .collect()
        ]

    assert order(on) == order(off)
    assert on.store.read("trap_quarantine").count() == 0


def test_engine_admission_cap(spark, trap_world, tmp_path_factory):
    """admit_cap_per_host bounds NEW frontier rows per (host, round)."""
    from crawler_spark.sources.fixtures_io import write_world

    world, victim, host = trap_world
    fd = str(tmp_path_factory.mktemp("cap_world"))
    write_world(spark, world, fd)
    eng = _run_engine(
        spark, world, fd, str(tmp_path_factory.mktemp("cap_store")),
        admit_cap_per_host=2,
    )
    per = (
        eng.store.read("frontier")
        .filter(F.col("discovered_round") > 0)
        .groupBy("discovered_round", "host")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per is not None and per <= 2
