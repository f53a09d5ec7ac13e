#!/usr/bin/env python
"""Composed ingest-pipeline bench at GB scale (VERDICT r4 #3).

Measures the nine-stage chain (crawler_spark/pipeline.py: WARC read ->
directives -> clean -> exact dedup -> MinHash-LSH -> decontaminate ->
boilerplate -> mix -> pack) as ONE composed program over a synthetic
web corpus, and audits the composed physical plan's exchange budget.

Two numbers per stage:
  * `wall_s`   — time to force the pipeline TRUNCATED at that stage
    (an aggregate over the stage's payload column, so column pruning
    cannot skip its work). Stages 1-3 re-run their own lineage each
    (map-only, no cache yet); stage 4 materializes the persist()ed
    exact-dedup output + minhash signatures, so stages 5-9 measure
    the post-dedup operators riding the cache — the production shape.
  * `rows` / `payload_mb` — stage output size, so the waterfall shows
    where the corpus shrinks.

Plan audit (same contract tests/test_pipeline_compose.py gates at
2k docs, re-asserted here at the bench scale): exactly ONE pinned
hashpartitioning(doc_id) for the whole chain, no ENSURE_REQUIREMENTS
re-shuffle on doc_id, and the total non-reused corpus-sized exchange
count within the documented budget.

Usage: python tools/bench_pipeline.py [n_docs] [cores]
       (defaults: 250_000 docs ~= 2.0 GB raw HTML, $SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAYLOAD = {
    "warc_read": "body",
    "directives": "body",
    "clean": "text",
    "exact_dedup": "text",
    "near_dedup": "text",
    "decontaminate": "text",
    "boilerplate": "text",
    "mix": "text",
    "pack": None,  # token counts, not text
}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    cores = (
        int(sys.argv[2])
        if len(sys.argv) > 2
        else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )

    from pyspark.sql import functions as F

    from crawler_spark.pipeline import ingest_stages, synth_pages
    from crawler_spark.session import get_spark
    from crawler_spark.sources.warc import write_warc

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(f"bench_pipeline_{cores}c", cores=cores)
    spark.range(1_000_000).select(F.expr("bit_xor(xxhash64(id))")).collect()

    warc_dir = tempfile.mkdtemp(prefix=f"bench_pipe_{n_docs}_")
    t0 = time.monotonic()
    # one archive per core keeps the binaryFile fan-out balanced
    write_warc(
        synth_pages(spark, n_docs).repartition(2 * cores), warc_dir
    ).count()
    gen_s = time.monotonic() - t0
    disk_mb = sum(
        os.path.getsize(os.path.join(warc_dir, f))
        for f in os.listdir(warc_dir)
    ) / 1e6

    stages = ingest_stages(spark, warc_dir + "/*.warc.gz", materialize=True)
    waterfall = {}
    for name, df in stages.items():
        pay = PAYLOAD[name]
        aggs = [F.count("*").alias("rows")]
        if pay is not None:
            aggs.append((F.sum(F.length(pay)) / 1e6).alias("mb"))
        else:
            aggs.append((F.sum("n_tokens") / 1e6).alias("mb"))  # Mtokens
        t0 = time.monotonic()
        row = df.agg(*aggs).collect()[0]
        waterfall[name] = {
            "wall_s": round(time.monotonic() - t0, 2),
            "rows": row["rows"],
            ("payload_mb" if pay else "mtokens"): round(float(row["mb"]), 1),
        }
        print(f"  {name:14s} {waterfall[name]}", file=sys.stderr, flush=True)

    # ---- composed-plan audit (final AQE plan of the full chain) ----
    pack = stages["pack"]
    pack.collect()
    plan = (
        pack._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    real = re.findall(r"(?<!Reused)Exchange hashpartitioning\((\w+)", plan)
    ensure_doc = re.findall(
        r"(?<!Reused)Exchange hashpartitioning\(doc_id#\d+L?, \d+\), ENSURE",
        plan,
    )
    audit = {
        "pinned_doc_id_repartitions": plan.count("REPARTITION_BY_NUM"),
        "ensure_requirements_doc_id_exchanges": len(ensure_doc),
        "non_reused_hash_exchanges": len(real),
        "exchange_keys": sorted(set(real)),
    }
    assert audit["pinned_doc_id_repartitions"] == 1, plan[:3000]
    assert audit["ensure_requirements_doc_id_exchanges"] == 0
    assert audit["non_reused_hash_exchanges"] <= 9, real

    shutil.rmtree(warc_dir, ignore_errors=True)
    out = {
        "bench": "composed_ingest_pipeline",
        "n_docs": n_docs,
        "cores": cores,
        "corpus_disk_mb_gz": round(disk_mb, 1),
        "gen_write_s": round(gen_s, 2),
        "chain_wall_s": round(
            sum(w["wall_s"] for w in waterfall.values()), 2
        ),
        "waterfall": waterfall,
        "plan_audit": audit,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
