"""Long-horizon engine soak (VERDICT r4 #10): 200+ rounds against a
DRIFTING synthetic web with every production guard enabled at once —
trap quarantine, per-host admission caps, AIMD politeness, Mercator
content-seen, bloom URL-seen, Cho/Garcia-Molina revisit scheduling,
and periodic PageRank refreshes feeding sitemap-style admission.

The web drifts: seed pages change on per-page periods (their chapter
TOCs grow, trap-shaped and robots-blocked links appear, occasionally
in storms), one host throttles for a 20-round window, and new depth-0
pages arrive via `enqueue_discovered`. Revisit scheduling is what
*notices* the drift — changed bodies are only observed when the
estimator forces a re-fetch, so discovery, content-seen and the trap
guard all run off real re-crawl traffic, not a scripted feed.

Invariants asserted on a cadence while the crawl runs:
  * frontier URL set == a sequential Python oracle of the admission
    chain (cycle guard → derived-key first-wins → trap filter →
    robots → URL-seen), fed ONLY by what the engine actually fetched
    (crawl_log) — this simultaneously proves no unbounded growth, no
    bloom false-drops, and no skipped admissions;
  * trap quarantine is monotone non-decreasing (and grows after
    storms);
  * AIMD budgets stay within [1, max_budget]; the throttled host's
    budget dips below the cap during its slow window;
  * per-round wall cost stays flat (median of late rounds bounded vs
    the warmed-up early band) — the O(Δ) MoR + compaction contract.

Reference anchors: the round loop is crawler.ts:293-510's analog; the
force path is checkpoint.ts:24-27 (F4).  Marked slow: ~200 engine
rounds; set SOAK_ROUNDS to shrink or extend.
"""

from __future__ import annotations

import os
import re
import statistics
import time
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.linkrank import pagerank, priority_from_rank
from crawler_spark.operators.revisit import due_now, revisit_schedule
from crawler_spark.operators.traps import trap_reasons
from crawler_spark.plans.store import SnapshotStore
from crawler_spark.sources.fetch import FixtureFetcher
from crawler_spark.streaming.rounds import MD_LINK_PAT, CrawlEngine

SOAK_ROUNDS = int(os.environ.get("SOAK_ROUNDS", "200"))
HOSTS = [f"h{i}.test" for i in range(6)]
N_SEEDS = 12  # two docs per host
PERIODS = [7, 9, 11, 13, 17, 19, 23, 8, 10, 12, 21, 15]  # drift periods
MAX_BUDGET = 6
THROTTLE_HOST = "h3.test"
THROTTLE_ROUNDS = range(55, 76)
ROUND_S = 3600  # one round == one synthetic hour
EPOCH = 1704067200  # fixed clock base — rounds must be replayable


def _host(i: int) -> str:
    return HOSTS[i // 2]


def _seed_url(i: int) -> str:
    return f"http://{_host(i)}/doc/{i}"


def _version(i: int, rnd: int) -> int:
    return rnd // PERIODS[i]


def _n_chapters(v: int) -> int:
    return min(3 + 2 * v, 35)


def _seed_body(i: int, rnd: int) -> str:
    """Deterministic drifting body. Every version is byte-distinct
    (content-seen must treat a changed page as fresh), chapter TOCs
    grow with the version, and from v1 on each version links one
    trap URL + one robots-blocked URL (a storm of 8 traps when
    v % 3 == 1). Derived keys (split('_')[-2]) are unique per body so
    D2 first-wins never shadows a legitimate link."""
    h, v = _host(i), _version(i, rnd)
    lines = [f"# Tài liệu {i} v{v}", f"nội dung {i}:{v}", ""]
    lines.append(f"![Hình {i} v{v}](http://{h}/img/{i}_{v}_x.png)")
    for c in range(1, _n_chapters(v) + 1):
        lines.append(f"- [Chương {c}](http://{h}/doc/{i}/ch_{c}_p)")
    if v >= 1:
        n_traps = 8 if v % 3 == 1 else 1
        for k in range(n_traps):
            lines.append(
                f"- [t](http://{h}/doc/{i}/loop/loop/loop/trap_t{v}x{k}_p)"
            )
        lines.append(f"- [b](http://{h}/private/blk_b{v}_p)")
    lines.append(f"- [self]({_seed_url(i)})")  # cycle guard food (D4)
    return "\n".join(lines)


def _chapter_body(url: str) -> str:
    return f"### {url}\n\nnội dung chương."


def _pages_for_round(rnd: int, extras: dict[str, str]) -> dict:
    """The whole fetchable web at round ``rnd`` (the drifting truth the
    fetcher serves). Chapters exist from the version that first listed
    them; every 5th chapter fails its first attempt (transient 503)."""
    pages: dict[str, tuple[str, int, int]] = {}
    for i in range(N_SEEDS):
        h = _host(i)
        lat = 9000 if h == THROTTLE_HOST and rnd in THROTTLE_ROUNDS else 20
        pages[_seed_url(i)] = (_seed_body(i, rnd), 0, lat)
        for c in range(1, _n_chapters(_version(i, rnd)) + 1):
            u = f"http://{h}/doc/{i}/ch_{c}_p"
            pages[u] = (_chapter_body(u), 1 if c % 5 == 0 else 0, lat)
    for u, body in extras.items():
        pages[u] = (body, 0, 20)
    return pages


def _oracle_links(page_url: str, body: str) -> list[str]:
    """Python twin of one page's admission chain, in the engine's
    stage order: cycle guard → derived-key first-wins (null keys group
    together, JS-undefined semantics) → trap filter → robots prefix."""
    kept, seen_keys = [], set()
    for _txt, u in re.findall(MD_LINK_PAT, body):
        if u == page_url:
            continue
        parts = u.split("_")
        key = parts[-2] if len(parts) >= 2 else "\x00undefined"
        if key in seen_keys:
            continue
        seen_keys.add(key)
        kept.append(u)
    out = []
    for u in kept:
        if trap_reasons(u):
            continue
        path = u.split(".test", 1)[1] if ".test" in u else u
        if path.startswith("/private"):
            continue
        out.append(u)
    return out


def _ts(rnd: int) -> datetime:
    return datetime.fromtimestamp(EPOCH + rnd * ROUND_S, tz=timezone.utc)


@pytest.mark.slow
def test_engine_soak(spark, tmp_path_factory):
    seeds = spark.createDataFrame(
        [
            (
                "A",
                i,
                "web",
                _seed_url(i),
                f"site{i // 2}",
                f"d{i:02d}",
                False,
                True,
                i,
            )
            for i in range(N_SEEDS)
        ],
        "genre_code string, document_number long, source_type string, "
        "source_url string, source string, document_id string, "
        "requires_manual_check boolean, has_chapters boolean, seq long",
    )
    robots = spark.createDataFrame(
        [(h, "/", True) for h in HOSTS] + [(h, "/private", False) for h in HOSTS],
        "host string, path_prefix string, allow boolean",
    )
    politeness = spark.createDataFrame(
        [(h, 2) for h in HOSTS], "host string, budget_per_round int"
    )

    extras: dict[str, str] = {}
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, str(tmp_path_factory.mktemp("soak_store"))),
        fetcher=FixtureFetcher(pages=_pages_for_round(0, extras)),
        robots=robots,
        politeness=politeness,
        default_budget=2,
        trap_guard=True,
        admit_cap_per_host=32,  # never binds here (traps eat the storms first)
        adaptive_politeness=True,
        max_budget=MAX_BUDGET,
        content_seen=True,
        use_bloom=True,
        bloom_shards=4,
        compact_every=8,
    )
    eng.init_frontier(seeds)

    seed_urls = {_seed_url(i): i for i in range(N_SEEDS)}
    oracle_seen = set(seed_urls)  # the URL-seen twin
    body_seen: set[str] = set()  # content-seen twin
    fetch_hist: list[tuple[str, int, bool]] = []  # (url, round, changed)
    last_body: dict[str, str] = {}
    walls: list[float] = []
    quarantine_counts = [0]
    budget_series: dict[str, list[int]] = {h: [] for h in HOSTS}
    last_processed = 0
    rnd = 0

    def run_one(force_ids=None):
        nonlocal rnd
        rnd += 1
        eng.fetcher = FixtureFetcher(pages=_pages_for_round(rnd, extras))
        t0 = time.monotonic()
        eng.run_round(rnd, force_ids=force_ids)
        walls.append(time.monotonic() - t0)

    def process_log_through(upto: int):
        """Feed the oracle from what the engine ACTUALLY fetched."""
        nonlocal last_processed
        rows = (
            eng.crawl_log()
            .filter(
                (F.col("round") > last_processed) & (F.col("round") <= upto)
            )
            .select("round", "url", "success")
            .collect()
        )
        for r in sorted(rows, key=lambda x: (x["round"], x["url"])):
            if not r["success"]:
                continue
            u = r["url"]
            if u in seed_urls:
                body = _seed_body(seed_urls[u], r["round"])
                changed = body != last_body.get(u, None)
                fetch_hist.append((u, r["round"], changed))
                last_body[u] = body
                if body in body_seen:
                    continue  # content-seen: no re-discovery
                body_seen.add(body)
                for link in _oracle_links(u, body):
                    oracle_seen.add(link)
        last_processed = upto

    def check_invariants():
        frontier_urls = {
            r["url"]
            for r in eng.store.read("frontier").select("url").collect()
        }
        assert frontier_urls == oracle_seen, (
            f"round {rnd}: frontier={len(frontier_urls)} "
            f"oracle={len(oracle_seen)} "
            f"extra={sorted(frontier_urls - oracle_seen)[:5]} "
            f"missing={sorted(oracle_seen - frontier_urls)[:5]}"
        )
        # bounded by the finite drifting universe
        assert len(frontier_urls) <= N_SEEDS * (1 + 35) + len(extras)
        if eng.store.exists("trap_quarantine"):
            q = eng.store.read("trap_quarantine").count()
            assert q >= quarantine_counts[-1], "quarantine must be monotone"
            quarantine_counts.append(q)
        for row in eng.politeness.collect():
            b = row["budget_per_round"]
            assert 1 <= b <= MAX_BUDGET, f"{row['host']} budget {b}"
            budget_series[row["host"]].append(b)

    def revisit_due():
        """Due seed docs, ONE per host (forcing a doc_id re-fetches the
        whole doc — two docs forced on one host would starve the second
        behind the first's chapters under the politeness budget)."""
        if not fetch_hist:
            return []
        hist = spark.createDataFrame(
            [(u, _ts(r), c) for (u, r, c) in fetch_hist],
            "url string, fetch_ts timestamp, changed boolean",
        )
        sched = revisit_schedule(
            hist, min_interval_s=ROUND_S, max_interval_s=16 * ROUND_S
        )
        due = due_now(sched, _ts(rnd)).collect()
        best: dict[str, tuple] = {}
        for r in due:
            i = seed_urls.get(r["url"])
            if i is None:
                continue
            k = _host(i)
            if k not in best or r["next_fetch_ts"] < best[k][0]:
                best[k] = (r["next_fetch_ts"], f"d{i:02d}")
        return [v[1] for v in best.values()]

    pagerank_events = 0
    for step in range(1, SOAK_ROUNDS + 1):
        run_one()
        if step % 5 == 0:
            process_log_through(rnd)
            check_invariants()
            dues = revisit_due()
            if dues:
                run_one(force_ids=dues)
        if step in (50, 100, 150):
            # link-importance refresh feeding sitemap-style admission
            ranks = pagerank(eng.link_graph(), iters=8)
            total = ranks.agg(F.sum("rank")).first()[0]
            assert total == pytest.approx(1.0, abs=1e-6)
            assert priority_from_rank(ranks).count() == ranks.count()
            pagerank_events += 1
            new = [
                (f"http://{h}/extra/e{step}_{k}_p", 0.9)
                for k, h in enumerate(HOSTS)
            ]
            for u, _p in new:
                extras[u] = f"trang bổ sung {u}"
                oracle_seen.add(u)
            eng.enqueue_discovered(
                spark.createDataFrame(new, "url string, priority double"),
                site="sitemap",
                rnd=rnd,
            )

    process_log_through(rnd)
    check_invariants()

    # the drift actually happened and was noticed
    assert len(body_seen) > N_SEEDS, "revisits must observe changed bodies"
    assert quarantine_counts[-1] > 0, "trap storms must quarantine"
    assert pagerank_events == (3 if SOAK_ROUNDS >= 150 else pagerank_events)
    # AIMD reacted to the slow window and stayed in band throughout
    if SOAK_ROUNDS > THROTTLE_ROUNDS.stop:
        assert any(b < MAX_BUDGET for b in budget_series[THROTTLE_HOST][12:]), (
            "throttled host's budget never dipped"
        )
    # near-total completion: everything admitted (except the newest
    # tail) got fetched under politeness budgets
    fr = eng.store.read("frontier")
    done = fr.filter("completed").count() / max(fr.count(), 1)
    assert done >= 0.9, f"completion {done:.2%}"

    # flat per-round cost: late rounds no worse than the warmed-up
    # early band (MoR deltas + compaction keep plans O(Δ))
    if len(walls) >= 80:
        warm = statistics.median(walls[10:40])
        late = statistics.median(walls[-30:])
        assert late <= 3.0 * warm, f"cost drift: warm {warm:.2f}s late {late:.2f}s"
        print(
            f"soak rounds={rnd} warm_median={warm:.2f}s late_median={late:.2f}s "
            f"frontier={len(oracle_seen)} quarantined={quarantine_counts[-1]}"
        )
