#!/usr/bin/env python
"""End-to-end CrawlEngine throughput: the REAL engine loop (politeness
select → fetch → extract → discover/dedup → snapshot commits incl.
merge-on-read frontier deltas + per-partition metrics) over an N-URL
synthetic frontier with the JVM-side SyntheticFetcher body model.

This is the honest frontier-throughput number — tools/bench_scaling.py
measures the pipeline shape at two parallelism levels; this measures
the shipped engine including all store I/O.

Usage: python tools/bench_engine.py [n_urls] [n_hosts] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 968
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from crawler_spark.plans.store import SnapshotStore
    from crawler_spark.session import get_spark
    from crawler_spark.sources.fetch import SyntheticFetcher
    from crawler_spark.streaming.rounds import FRONTIER_COLS, CrawlEngine, N_SALTS

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("bench_engine")
    spark.range(1_000_000).select(F.expr("bit_xor(xxhash64(id))")).collect()

    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="bench_engine_"))
    host = F.concat(F.lit("host"), (F.col("id") % n_hosts).cast("string"))
    frontier = (
        spark.range(n_urls)
        .select(
            F.col("id"),
            host.alias("host"),
            F.concat(F.lit("http://"), host, F.lit(".vn/doc/"), F.col("id").cast("string")).alias("url"),
        )
        .withColumn("url_key", F.xxhash64("url"))
        .withColumn("host_salt", F.pmod(F.xxhash64("url"), F.lit(N_SALTS)).cast("int"))
        .withColumn("site", F.lit("bench"))
        .withColumn("doc_id", F.concat(F.lit("D"), F.col("id").cast("string")))
        .withColumn("depth", F.lit(0))
        .withColumn("requires_manual_check", F.col("id") % 13 == 0)
        .withColumn("document_number", F.col("id").cast("int"))
        .withColumn("has_chapters", F.lit(False))
        .withColumn("discovered_round", F.lit(0))
        .withColumn("completed", F.lit(False))
        .withColumn("attempts", F.lit(0))
        .select(*FRONTIER_COLS)
    )
    store.commit("frontier", frontier, lineage={"op": "bench_init", "round": 0})

    budget = n_urls // (n_hosts * n_rounds) + 1
    politeness = spark.createDataFrame(
        [("host0", budget)], "host string, budget_per_round int"
    )
    robots = spark.createDataFrame(
        [("none", "/", True)], "host string, path_prefix string, allow boolean"
    )
    engine = CrawlEngine(
        spark=spark,
        store=store,
        fetcher=SyntheticFetcher(),
        robots=robots,
        politeness=politeness,
        default_budget=budget,
        salted_fetch=False,  # 968 groups of ~50; salting would make 15k tiny pandas groups (~1-3ms overhead each)
    )

    # warm python worker pool untimed
    engine.run_round(0)

    t0 = time.perf_counter()
    fetched = 0
    r = 0
    while True:
        r += 1
        m = engine.run_round(r)
        if m.get("scheduled", 0) == 0:
            break
        fetched += m["fetched_ok"]
    sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "n_urls": n_urls,
                "n_hosts": n_hosts,
                "budget": budget,
                "rounds": r - 1,
                "fetched_ok": fetched,
                "sec": round(sec, 2),
                "urls_per_sec": round(fetched / sec, 1),
                "extractions": store.read("extractions").count(),
            }
        )
    )


if __name__ == "__main__":
    main()
