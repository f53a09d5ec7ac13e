"""PageRank frontier scoring: exact agreement with a dense numpy
oracle (dangling nodes included), mass conservation, early stop, the
map-only priority transform, and the engine's link-graph accessor."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.linkrank import pagerank, priority_from_rank

D = 0.85


def _numpy_pagerank(edges, iters=30, d=D):
    """Same semantics as operators/linkrank.pagerank: uniform init,
    uniform dangling redistribution, duplicate edges collapsed."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    uniq = sorted(set(edges))
    deg = np.zeros(n)
    for u, _ in uniq:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in uniq:
            contrib[idx[v]] += r[idx[u]] / deg[idx[u]]
        dangling = 1.0 - contrib.sum()
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return {node: r[idx[node]] for node in nodes}


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(31)
    n = 60
    edges = {
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(150)
    }
    edges = [(u, v) for u, v in edges if u != v]
    # make a few guaranteed dangling sinks + an isolated-popular node
    edges += [(u, 900) for u in range(5)] + [(u, 901) for u in range(9, 12)]
    return edges


def test_matches_numpy_oracle(spark, graph):
    df = spark.createDataFrame(graph, "src long, dst long")
    # duplicate rows must collapse (a page linking twice votes once)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df.union(df), iters=30).collect()
    }
    want = _numpy_pagerank(graph, iters=30)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the 5-inlink sink outranks the 3-inlink one
    assert got[900] > got[901]


def test_early_stop_tolerance(spark, graph):
    df = spark.createDataFrame(graph, "src long, dst long")
    fixed = {r["node"]: r["rank"] for r in pagerank(df, iters=60).collect()}
    early = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=60, tol=1e-10).collect()
    }
    for k in fixed:
        assert early[k] == pytest.approx(fixed[k], abs=1e-6)


def test_priority_from_rank_monotone_and_map_only(spark, graph):
    df = spark.createDataFrame(graph, "src long, dst long")
    ranks = pagerank(df, iters=10)
    pri = priority_from_rank(ranks)
    rows = (
        ranks.join(pri, "node")
        .orderBy(F.col("rank").desc())
        .select("rank", "priority")
        .collect()
    )
    ps = [r["priority"] for r in rows]
    assert ps == sorted(ps)  # higher rank never gets a worse (lower) key
    assert ps[0] >= 0
    plan = (
        priority_from_rank(ranks)._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the transform itself adds no exchange over its input
    assert plan.count("Exchange") <= ranks._jdf.queryExecution().executedPlan().toString().count("Exchange")
    single_sorts = [
        ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln
    ]
    assert not single_sorts


def test_engine_link_graph_rankable(spark, tmp_path_factory):
    """Crawl the fixture world, rank its real link graph, and check the
    Spark ranks against the numpy oracle on the same edges."""
    from crawler_spark.oracle.fixtures import build_world
    from crawler_spark.sources.fetch import FixtureFetcher
    from crawler_spark.sources.fixtures_io import read_table, write_world
    from crawler_spark.plans.store import SnapshotStore
    from crawler_spark.streaming.rounds import CrawlEngine

    world = build_world(n_docs=10, seed=3)
    fd = str(tmp_path_factory.mktemp("lr_world"))
    write_world(spark, world, fd)
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, str(tmp_path_factory.mktemp("lr_store"))),
        fetcher=FixtureFetcher(
            pages={
                u: (p.body, p.fail_rounds, p.latency_ms)
                for u, p in world.pages.items()
            }
        ),
        robots=read_table(spark, fd, "robots"),
        politeness=read_table(spark, fd, "politeness"),
    )
    eng.init_frontier(read_table(spark, fd, "seeds"))
    eng.run(max_rounds=50)

    edges_df = eng.link_graph()
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    assert edges, "fixture world must produce a link graph"
    got = {r["node"]: r["rank"] for r in pagerank(edges_df, iters=20).collect()}
    want = _numpy_pagerank(edges, iters=20)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
