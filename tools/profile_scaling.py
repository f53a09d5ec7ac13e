#!/usr/bin/env python
"""Stage-by-stage profiling of the scaling job (diagnosis tool)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.operators.dedup import anti_join_seen, first_wins
from crawler_spark.operators.politeness import select_round
from crawler_spark.session import get_spark
from crawler_spark.sources.fetch import SyntheticFetcher, fetch_scheduled
from crawler_spark.streaming.rounds import MD_LINK_PAT
from crawler_spark.functions.text import md_images_col

cores = int(sys.argv[1])
urls = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
hosts = 968
# optional per-host budget override: the 10^9-frontier row schedules a
# politeness-capped subset (the realistic round shape — a 10^10
# frontier never fetches itself whole in one round), so the measured
# cost is the frontier-side work: the select_round scan + window, and
# the anti-join against the full frontier key set
budget_override = int(sys.argv[3]) if len(sys.argv) > 3 else None

spark = get_spark(f"prof_{cores}", cores=cores, shuffle_partitions=max(cores * 2, 16))
spark.range(1_000_000).select(F.sum("id")).collect()

budget = budget_override or (urls // hosts + 1)
host = F.concat(F.lit("host"), (F.col("id") % hosts).cast("string"))
frontier = (
    spark.range(urls)
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
politeness = spark.createDataFrame([("host0", budget)], "host string, budget_per_round int")

t = {}

t0 = time.perf_counter()
scheduled = select_round(frontier, politeness, default_budget=budget).cache()
scheduled.count()
t["select_round"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
fetched = fetch_scheduled(scheduled, SyntheticFetcher()).cache()
fetched.count()
t["fetch"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
ok = fetched.filter(F.col("success"))
imgs = ok.select(
    F.col("url").alias("page_url"),
    F.posexplode(md_images_col(F.col("body"))).alias("pos", "img"),
)
imgs.count()
t["extract_imgs"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
links = ok.select(
    F.col("url").alias("page_url"),
    F.explode(F.regexp_extract_all(F.col("body"), F.lit(MD_LINK_PAT), F.lit(2))).alias("url"),
).cache()
links.count()
t["extract_links"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
fw = first_wins(links, key="url", order_cols=[F.col("page_url")]).cache()
fw.count()
t["first_wins"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
anti_join_seen(fw, frontier, key="url").count()
t["anti_join"] = round(time.perf_counter() - t0, 2)

t["total"] = round(sum(v for k, v in t.items() if k != "total"), 2)
print(json.dumps({"cores": cores, "urls": urls, "budget": budget,
                  "scheduled": scheduled.count(), **t}))
