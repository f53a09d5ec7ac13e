#!/usr/bin/env python
"""Skewed-host fetch benchmark: salting on/off (VERDICT r2 #10).

A zipf-ish frontier where ONE host owns ~30% of all URLs (the
dominant-domain case the north rule calls out) runs the real
select→fetch path twice: unsalted (one applyInPandas group = the whole
dominant host, a straggler task) and salted (the host splits into
N_SALTS parallel groups). Reports wall time + URLs/s for both and the
break-even context for fetch.SALT_MIN_BUDGET.

Usage: python tools/bench_skew.py [n_urls] [big_budget] [trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.politeness import select_round  # noqa: E402
from crawler_spark.sources.fetch import SyntheticFetcher, fetch_scheduled  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402

N_SALTS = 16


def synth_skewed(spark, n: int):
    """~30% of URLs on host big0, the rest uniform over 997 hosts."""
    df = spark.range(n)
    host = F.when(F.col("id") % 10 < 3, F.lit("big0")).otherwise(
        F.concat(F.lit("host"), (F.col("id") % 997).cast("string"))
    )
    return (
        df.select(
            host.alias("host"),
            F.concat(F.lit("http://"), host, F.lit("/p/"), F.col("id")).alias("url"),
        )
        .withColumn("host_salt", F.pmod(F.xxhash64("url"), F.lit(N_SALTS)).cast("int"))
        .withColumn("url_key", F.xxhash64("url"))
        .withColumn("requires_manual_check", F.col("url_key") % 13 == 0)
        .withColumn(
            "document_number", F.pmod(F.col("url_key"), F.lit(1_000_000)).cast("int")
        )
        .withColumn("depth", F.lit(0))
        .withColumn("completed", F.lit(False))
        .withColumn("attempts", F.lit(0).cast("int"))
    )


class CpuBoundFetcher:
    """Models a real fetch+parse stage whose per-URL cost is CPU (DOM
    parse, text cleanup, hashing) rather than allocator bandwidth.
    SyntheticFetcher's body GENERATION is memory-bandwidth-bound on
    this box (~300k rows/s regardless of cores — BENCH.md §0), so it
    cannot show a parallelization win; per-URL CPU work can."""

    def __init__(self, iters: int = 300):
        # ~60 µs/URL — the low end of a real HTML parse + cleanup chain
        # (50 µs - 1 ms/page); at 30 iters (~6 µs) the stage is too
        # cheap for the straggler to dominate and salting shows ~1.1x
        self.iters = iters

    def fetch_batch(self, pdf):
        import hashlib

        bodies = []
        for url in pdf["url"]:
            h = url.encode()
            for _ in range(self.iters):
                h = hashlib.sha256(h).digest()
            bodies.append(h.hex())
        out = pdf.copy()
        out["body"] = bodies
        out["status"] = 200
        out["success"] = True
        out["latency_ms"] = 1
        return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    big_budget = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bench_skew")
    spark.range(1_000_000).select(F.sum("id")).collect()
    # warm the Python worker pool before timing (1 s/core one-time)
    warm = synth_skewed(spark, 2_000).limit(1_000).withColumn("attempt", F.lit(1))
    fetch_scheduled(warm, SyntheticFetcher()).count()

    frontier = synth_skewed(spark, n).cache()
    frontier.count()
    politeness = spark.createDataFrame(
        [("big0", big_budget)], "host string, budget_per_round int"
    )
    scheduled = select_round(
        frontier, politeness, default_budget=2, cap=big_budget
    ).cache()
    n_sched = scheduled.count()

    for label, fetcher in (
        ("bandwidth-bound gen", SyntheticFetcher()),
        ("cpu-bound parse", CpuBoundFetcher()),
    ):
        results = {}
        for salted in (False, True):
            best = None
            for _ in range(trials):
                t0 = time.perf_counter()
                fetch_scheduled(scheduled, fetcher, salted=salted).agg(
                    F.sum(F.length("body"))
                ).collect()
                s = time.perf_counter() - t0
                best = s if best is None else min(best, s)
            results[salted] = best
            print(
                f"{label:>18} salted={salted!s:>5}: best {best:6.2f} s "
                f"({n_sched / best:,.0f} scheduled URLs/s)",
                flush=True,
            )
        print(
            f"{label:>18} skew speedup from salting: "
            f"{results[False] / results[True]:.2f}x "
            f"(n={n:,}, big-host budget={big_budget:,}, scheduled={n_sched:,})",
            flush=True,
        )


if __name__ == "__main__":
    main()
