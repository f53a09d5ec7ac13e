"""crawler_spark — a PySpark-native URL-frontier and fetch scheduler.

A brand-new engine (not a port) reproducing the crawl semantics of the
reference TypeScript crawler (see SURVEY.md): per-site seed lists,
priority ordering (requires_manual_check false-first, then document
number — reference ``src/lib/crawler/sortUtils.ts:9-21``), lazy chapter
expansion, URL-seen deduplication, resumable completion-flag
checkpointing, per-host politeness budgets, robots filtering, and
image+caption extraction — expressed as idiomatic Spark DataFrame
pipelines over snapshot-versioned parquet tables (Iceberg-style; see
``crawler_spark.plans.store``).

Layout:
    session     — tuned SparkSession builder
    canonical   — URL canonicalization (Spark exprs + Python mirror)
    ids         — hierarchical DSG id grammar (format/parse, pure exprs)
    functions/  — scalar/text/image/similarity function library
    sources/    — seed + web-graph scans with schema validation
    operators/  — dedup (exact/bloom/minhash/simhash), politeness,
                  priority, top-k, numbering
    plans/      — snapshot table store (parquet + atomic manifest),
                  frontier log-structured state
    streaming/  — driver-looped crawl rounds (BSP micro-batches)
    oracle/     — sequential golden oracle + synthetic fixtures
"""

__version__ = "0.1.0"
