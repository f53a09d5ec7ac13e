#!/usr/bin/env python
"""MoR read-cost curve vs delta-chain length at large base (VERDICT r2 #2).

The compaction-cadence question decomposes as: per-round read cost is a
function of CHAIN LENGTH (rounds since last compact), and a cadence of
``compact_every=c`` pays (compact_cost / c) amortized per round while
reads see chains 1..c. So the sweep measures:

  * read cost (eligibility count) at chain lengths 1, 2, 4, 8, 16 over
    an N-row base (default 10^8);
  * one compact() cost at the longest chain;
  * the amortized per-round total for c ∈ {4, 8, 16}.

Usage: python tools/bench_mor_sweep.py [n_rows] [delta_per_round] [trials]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.politeness import eligible  # noqa: E402
from crawler_spark.plans.store import SnapshotStore  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402


def synth(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.xxhash64("id").alias("url_key"),
        F.concat(F.lit("http://h"), (F.col("id") % 997), F.lit("/p"), F.col("id")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 997)).alias("host"),
        (F.col("id") % 2 == 0).alias("completed"),
        F.lit(0).cast("int").alias("attempts"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("bench_mor_sweep")
    spark.range(10_000_000).select(F.sum("id")).collect()

    root = tempfile.mkdtemp(prefix="mor_sweep_")
    store = SnapshotStore(spark, root)
    t0 = time.perf_counter()
    store.commit("frontier", synth(spark, n))
    print(f"base write ({n:,} rows): {time.perf_counter() - t0:.1f} s", flush=True)

    def read_cost():
        best = None
        for _ in range(trials):
            t = time.perf_counter()
            cnt = eligible(store.read("frontier")).count()
            s = time.perf_counter() - t
            best = s if best is None else min(best, s)
        return best, cnt

    base_cost, _ = read_cost()
    print(f"chain  0: read {base_cost:6.2f} s (base only)", flush=True)

    curve = {0: base_cost}
    chain = 0
    for target in (1, 2, 4, 8, 16):
        while chain < target:
            # completion marks for existing keys + fresh discoveries,
            # key-disjoint like the engine's per-round delta
            marks = synth(spark, nd // 2, offset=chain * nd).withColumn(
                "completed", F.lit(True)
            )
            disc = synth(spark, nd // 2, offset=n + chain * nd)
            store.commit_upsert(
                "frontier", marks.unionByName(disc), key="url_key"
            )
            chain += 1
        c, cnt = read_cost()
        curve[chain] = c
        print(f"chain {chain:>2}: read {c:6.2f} s ({cnt:,} eligible)", flush=True)

    t0 = time.perf_counter()
    store.compact("frontier", partition_by=["completed"])
    compact_cost = time.perf_counter() - t0
    print(f"compact at chain 16: {compact_cost:.1f} s", flush=True)
    post_cost, _ = read_cost()
    print(f"post-compact read: {post_cost:6.2f} s (completed-partition pruning)", flush=True)

    for c in (4, 8, 16):
        # average read over chains 1..c + amortized compact
        chains = [k for k in curve if 1 <= k <= c]
        avg_read = sum(curve[k] for k in chains) / len(chains)
        print(
            f"cadence {c:>2}: ~{avg_read + compact_cost / c:6.2f} s/round "
            f"(avg read {avg_read:.2f} + compact {compact_cost:.1f}/{c})",
            flush=True,
        )


if __name__ == "__main__":
    main()
