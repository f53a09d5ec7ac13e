#!/usr/bin/env python
"""Merge-on-read frontier READ-path benchmark (VERDICT r1 fix #1).

Builds an N-row frontier base + a small delta chain, then times the
per-round read pattern (eligibility scan + count) under:

  * ``global-window`` — the r1 shape: row_number() over base+deltas
    partitioned by key (shuffles the WHOLE frontier);
  * ``delta-anti``    — the r2 shape shipped in plans/store.py:
    deltas self-resolve, base passes through a broadcast anti-join
    with the eligibility predicate pushed into the scan;
  * ``delta-anti+part`` — same, after compact(partition_by=
    ['completed']) so the scan also prunes finished work.

Usage: python tools/bench_mor.py [n_rows] [n_delta] [trials]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.politeness import eligible  # noqa: E402
from crawler_spark.plans.store import SnapshotStore  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402


def synth(spark, n):
    return spark.range(n).select(
        F.xxhash64("id").alias("url_key"),
        F.concat(F.lit("http://h"), (F.col("id") % 997), F.lit("/p"), F.col("id")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 997)).alias("host"),
        (F.col("id") % 2 == 0).alias("completed"),
        F.lit(0).cast("int").alias("attempts"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bench_mor")
    spark.range(10_000_000).select(F.sum("id")).collect()  # warmup

    root = tempfile.mkdtemp(prefix="mor_")
    store = SnapshotStore(spark, root)
    base = synth(spark, n)
    store.commit("frontier", base)
    delta = synth(spark, nd).withColumn("completed", F.lit(True))
    store.commit_upsert("frontier", delta, key="url_key")

    def timeit(label, df_fn):
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            cnt = df_fn().count()
            s = time.perf_counter() - t0
            best = s if best is None else min(best, s)
        print(f"{label:>16}: best {best:6.2f} s  ({cnt:,} eligible rows)")
        return best

    # r1 shape: global window over base + delta
    def global_window():
        b = spark.read.parquet(os.path.join(root, "frontier/v0")).withColumn("_dr", F.lit(0))
        d = spark.read.parquet(os.path.join(root, "frontier/v1")).withColumn("_dr", F.lit(1))
        u = b.unionByName(d)
        w = Window.partitionBy("url_key").orderBy(F.col("_dr").desc())
        merged = (
            u.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_dr", "_rn")
        )
        return eligible(merged)

    # r2 shape: what store.read() now plans
    def delta_anti():
        return eligible(store.read("frontier"))

    t_old = timeit("global-window", global_window)
    t_new = timeit("delta-anti", delta_anti)

    store.compact("frontier", partition_by=["completed"])
    store.commit_upsert(
        "frontier", synth(spark, nd // 2).withColumn("completed", F.lit(True)), key="url_key"
    )
    t_part = timeit("delta-anti+part", delta_anti)

    print(
        f"speedup read-path: {t_old / t_new:.2f}x (anti-join) / "
        f"{t_old / t_part:.2f}x (with completed-partition pruning), "
        f"n={n:,} delta={nd:,}"
    )


if __name__ == "__main__":
    main()
