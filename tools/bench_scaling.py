#!/usr/bin/env python
"""Scaling-efficiency benchmark: same crawl-round job at two parallelism
levels (the sandbox proxy for N vs 4N executors — BASELINE.json requires
throughput scaling efficiency >= 0.8 from N to 4N).

One measured job = one full crawl round over an M-URL synthetic frontier:

  politeness select (window top-k per host, shuffle on host)
    -> fetch (JVM-synthesized bodies standing in for the network +
       per-host applyInPandas bookkeeping across the Arrow boundary)
    -> extract image+caption pairs (JVM regexp)
    -> discover outlinks + first-wins + anti-join dedup vs frontier
    -> aggregate (counts forced)

Because even a perfectly-parallel JVM kernel does not reach 4x from N
to 4N threads on a virtualized host (turbo/steal frequency scaling), a
measured machine ceiling accompanies the job numbers and the efficiency
is reported both raw (vs ideal 4x) and normalized to that ceiling.

Each parallelism level runs in its OWN subprocess (a SparkSession's
master can't change after getOrCreate). JVM/session startup is excluded
from the timing; the measured span is submit-to-collect of the round.

Usage:
  python tools/bench_scaling.py                 # orchestrate 8 vs 32, write BENCH.md table
  python tools/bench_scaling.py --cores 8 --urls 400000   # one level, print JSON
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(cores: int, urls: int, hosts: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from crawler_spark.operators.dedup import anti_join_seen, first_wins
    from crawler_spark.operators.politeness import select_round
    from crawler_spark.session import get_spark
    from crawler_spark.streaming.rounds import MD_LINK_PAT
    from crawler_spark.functions.text import md_images_col

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=max(cores * 2, 16))

    def build_frontier(n: int):
        host = F.concat(F.lit("host"), (F.col("id") % hosts).cast("string"))
        return (
            spark.range(n)
            .select(
                F.col("id"),
                host.alias("host"),
                F.concat(F.lit("http://"), host, F.lit(".vn/doc/"), F.col("id").cast("string")).alias("url"),
            )
            .withColumn("url_key", F.xxhash64("url"))
            .withColumn("requires_manual_check", F.col("id") % 13 == 0)
            .withColumn("document_number", F.col("id").cast("int"))
            .withColumn("depth", F.lit(0))
            .withColumn("completed", F.lit(False))
            .withColumn("attempts", F.lit(0))
            .drop("id")
        )

    politeness = spark.createDataFrame(
        [("host0", urls // hosts + 1)], "host string, budget_per_round int"
    )

    def one_round(frontier, budget: int) -> tuple[int, int, int]:
        """The measured job: politeness select -> fetch -> extract ->
        discover/dedup.

        Fetch modeling: a production fetch stage is network-bound — the
        page content arrives over the wire, not from CPU. So the body
        is synthesized JVM-side (codegen concat/repeat standing in for
        the socket) and the pandas stage does what a real fetcher's CPU
        does: per-host batch bookkeeping (status/latency/success) across
        the Arrow boundary. Python-side *content generation* would
        benchmark the stand-in, not the engine.
        """
        scheduled = select_round(frontier, politeness, default_budget=budget)

        h = F.crc32(F.col("url")).cast("string")
        parts = [F.lit("# Trang "), F.col("url"), F.lit("\n\n")]
        for i in range(2):
            parts += [F.lit("![Hình "), h, F.lit(f"-{i}]("), F.col("url"),
                      F.lit("/img-"), h, F.lit(f"-{i}.png)\n\n")]
        parts += [F.repeat(F.lit("từ khóa nội dung tiếng Việt "), 30), F.lit("\n\n")]
        for i in range(4):
            parts += [F.lit("[chương "), h, F.lit(f"-{i}]("), F.col("url"),
                      F.lit(f"/ch{i})\n")]
        with_body = scheduled.withColumn("body", F.concat(*parts))

        out_schema = T.StructType(
            with_body.schema.fields
            + [
                T.StructField("status", T.IntegerType(), False),
                T.StructField("success", T.BooleanType(), False),
                T.StructField("latency_ms", T.IntegerType(), False),
            ]
        )

        def _bookkeep(pdf):
            out = pdf.copy()
            out["status"] = 200
            out["success"] = True
            out["latency_ms"] = 1
            return out

        fetched = with_body.groupBy("host").applyInPandas(_bookkeep, out_schema)
        ok = fetched.filter(F.col("success"))
        per_page = ok.select(
            F.col("url").alias("page_url"),
            F.size(md_images_col(F.col("body"))).alias("n_imgs"),
            F.regexp_extract_all(F.col("body"), F.lit(MD_LINK_PAT), F.lit(2)).alias("links"),
        ).cache()
        row = per_page.select(
            F.count(F.lit(1)).alias("pages"), F.sum("n_imgs").alias("imgs")
        ).collect()[0]
        links = per_page.select("page_url", F.explode("links").alias("url"))
        fw = first_wins(links, key="url", order_cols=[F.col("page_url")])
        n_new = anti_join_seen(fw, frontier, key="url").count()
        per_page.unpersist()
        return int(row["pages"]), int(row["imgs"]), n_new

    # warm-up: JVM codegen + python-worker pool + window/join paths.
    # The first pandas-UDF stage pays a one-time worker-pool spin-up
    # (~1 s/core observed); untimed here, exactly as a long-lived
    # cluster amortizes it.
    spark.range(2_000_000).select(F.expr("bit_xor(xxhash64(id))")).collect()
    one_round(build_frontier(max(cores * 4000, 32_000)), budget=1_000_000)

    frontier = build_frontier(urls).cache()
    frontier.count()
    budget = urls // hosts + 1
    trials = []
    for _ in range(4):
        t0 = time.perf_counter()
        n_pages, n_imgs, n_new = one_round(frontier, budget)
        trials.append(round(time.perf_counter() - t0, 3))
    sec = min(trials)

    # machine ceiling: a perfectly-parallel JVM hash kernel at this same
    # parallelism. On a virtualized host, per-core throughput drops as
    # more cores engage (turbo/steal), so even ideal code cannot reach
    # 4x from N to 4N threads; the ceiling separates hardware limits
    # from job-scaling overhead.
    n_kernel = 1_000_000_000
    t0 = time.perf_counter()
    spark.range(n_kernel).select(
        F.expr("bit_xor(xxhash64(xxhash64(xxhash64(xxhash64(xxhash64(id))))))")
    ).collect()
    ceiling_sec = time.perf_counter() - t0

    return {
        "ceiling_rows_per_sec": round(n_kernel / ceiling_sec, 1),
        "cores": cores,
        "urls": urls,
        "hosts": hosts,
        "fetched": n_pages,
        "images": n_imgs,
        "new_links": n_new,
        "trials_sec": trials,
        "sec": sec,
        "urls_per_sec": round(n_pages / sec, 1),
    }


def orchestrate(urls: int, hosts: int, levels: tuple[int, int] = (8, 32)) -> None:
    results = {}
    for cores in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores),
             "--urls", str(urls), "--hosts", str(hosts)],
            capture_output=True, text=True, check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        print(f"local[{cores}]: {results[cores]}", file=sys.stderr)

    lo, hi = levels
    speedup = results[hi]["urls_per_sec"] / results[lo]["urls_per_sec"]
    ceiling_speedup = (
        results[hi]["ceiling_rows_per_sec"] / results[lo]["ceiling_rows_per_sec"]
    )
    summary = {
        "levels": {str(k): v for k, v in results.items()},
        "speedup": round(speedup, 3),
        "ideal": hi / lo,
        "raw_efficiency": round(speedup / (hi / lo), 3),
        "machine_ceiling_speedup": round(ceiling_speedup, 3),
        "scaling_efficiency_vs_ceiling": round(speedup / ceiling_speedup, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--urls", type=int, default=4_000_000)
    ap.add_argument("--hosts", type=int, default=968)
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run_one(args.cores, args.urls, args.hosts)))
    else:
        orchestrate(args.urls, args.hosts)
