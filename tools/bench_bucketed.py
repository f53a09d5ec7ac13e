#!/usr/bin/env python
"""Politeness round over a host-BUCKETED stored frontier vs the same
frontier read plain — measures what plans/bucketed.py buys: the
bucketed read satisfies the window's ClusteredDistribution(host), so
select_round runs with zero frontier-side exchanges.

Usage: python tools/bench_bucketed.py [n_urls] [hosts] [cores] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.politeness import select_round  # noqa: E402
from crawler_spark.plans.bucketed import (  # noqa: E402
    read_bucketed_frontier,
    write_bucketed_frontier,
)
from crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 968
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    spark = get_spark(
        "bench_bucketed",
        cores=cores,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="bucket_wh_")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    frontier = spark.range(n).select(
        F.concat(F.lit("h"), (F.col("id") % hosts)).alias("host"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 13 == 0).alias("requires_manual_check"),
        F.col("id").cast("int").alias("document_number"),
        F.lit(0).alias("depth"),
        F.lit(False).alias("completed"),
        F.lit(0).cast("int").alias("attempts"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
    )
    pol = spark.createDataFrame(
        [("h0", 100)], "host string, budget_per_round int"
    )

    t0 = time.perf_counter()
    write_bucketed_frontier(frontier, "bench_frontier", buckets=cores)
    t_write = time.perf_counter() - t0
    # plain path reads the SAME parquet files by path (no bucket info)
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED bench_frontier")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    plain = spark.read.parquet(loc)
    bucketed = read_bucketed_frontier(spark, "bench_frontier")

    out = {"n_urls": n, "hosts": hosts, "cores": cores, "write_sec": round(t_write, 2)}
    for name, df in (("plain", plain), ("bucketed", bucketed)):
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            n_sched = select_round(df, pol, default_budget=50).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[f"{name}_sec"] = round(best, 2)
        out["scheduled"] = n_sched
    out["speedup"] = round(out["plain_sec"] / out["bucketed_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
