#!/usr/bin/env python
"""spark-submit entry point: run the crawl engine end-to-end over the
synthetic fixture world (or any directory holding seeds/web_graph/
robots/politeness parquet in the fixtures_io schemas).

    tools/submit.sh tools/crawl_job.py --out /tmp/crawl_store --docs 60

On a cluster, replace the FixtureFetcher with HttpFetcher and point
--fixtures at real seed tables; the engine code is identical (the
fetcher is the only pluggable I/O surface).
"""

from __future__ import annotations

import argparse
import json
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="snapshot store directory")
    ap.add_argument("--fixtures", default=None, help="existing fixture dir (else synthesized)")
    ap.add_argument("--docs", type=int, default=60)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-rounds", type=int, default=50)
    ap.add_argument("--bloom", action="store_true", help="enable the bloom dedup tier")
    ap.add_argument("--trees", action="store_true", help="emit sentence/footnote/heading tables post-crawl")
    ap.add_argument("--images", action="store_true", help="materialize the input_hint images table post-crawl")
    args = ap.parse_args()

    # spark-submit provides the session config; fall back to local dev
    spark = SparkSession.builder.appName("crawl_job").getOrCreate()

    from crawler_spark.oracle.fixtures import build_world
    from crawler_spark.plans.store import SnapshotStore
    from crawler_spark.sources.fetch import FixtureFetcher
    from crawler_spark.sources.fixtures_io import read_table, write_world
    from crawler_spark.streaming.rounds import CrawlEngine

    world = build_world(n_docs=args.docs, seed=args.seed)
    fixture_dir = args.fixtures or tempfile.mkdtemp(prefix="crawl_fixtures_")
    if not args.fixtures:
        write_world(spark, world, fixture_dir)

    engine = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, args.out),
        fetcher=FixtureFetcher(
            pages={u: (p.body, p.fail_rounds, p.latency_ms) for u, p in world.pages.items()}
        ),
        robots=read_table(spark, fixture_dir, "robots"),
        politeness=read_table(spark, fixture_dir, "politeness"),
        use_bloom=args.bloom,
    )
    engine.init_frontier(read_table(spark, fixture_dir, "seeds"))
    metrics = engine.run(max_rounds=args.max_rounds)
    for m in metrics:
        print(json.dumps(m))
    summary = {"urls_seen": engine.url_seen().count(),
               "extractions": engine.extractions().count()}
    if args.trees:
        summary.update(engine.build_documents())
    if args.images:
        summary.update(
            engine.materialize_images(read_table(spark, fixture_dir, "images"))
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
