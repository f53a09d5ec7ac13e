"""Host-bucketed frontier: select_round with ZERO exchanges (the
10^10-scale politeness layout — plans/bucketed.py) and byte-identical
results vs the unbucketed path."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.politeness import select_round
from crawler_spark.plans.bucketed import (
    read_bucketed_frontier,
    write_bucketed_frontier,
)


def _frontier(spark, n=5000, hosts=37):
    return spark.range(n).select(
        F.concat(F.lit("h"), (F.col("id") % hosts)).alias("host"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(False).alias("requires_manual_check"),
        F.col("id").cast("int").alias("document_number"),
        F.lit(0).alias("depth"),
        F.lit(False).alias("completed"),
        F.lit(0).cast("int").alias("attempts"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
    )


def test_bucketed_politeness_round_has_no_exchange(spark):
    fr = _frontier(spark)
    write_bucketed_frontier(fr, "fb_test", buckets=8)
    try:
        t = read_bucketed_frontier(spark, "fb_test")
        pol = spark.createDataFrame(
            [("h0", 4)], "host string, budget_per_round int"
        )
        out = select_round(t, pol, default_budget=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the FRONTIER side must be exchange-free: Window → (limit/sort)
        # → bucketed FileScan with nothing shuffled in between. (The
        # tiny politeness dim still broadcasts — that's the point.)
        lines = plan.splitlines()
        wi = next(i for i, l in enumerate(lines) if "Window [row_number" in l)
        si = next(i for i, l in enumerate(lines) if "FileScan" in l and i > wi)
        between = "\n".join(lines[wi:si + 1])
        assert "Exchange" not in between, between
        assert "Bucketed: true" in lines[si]
        # exactly ONE hashpartitioning exchange total (politeness-dim
        # dedup); the plain path has two
        assert plan.count("Exchange hashpartitioning") == 1, plan

        # identical results vs the plain (shuffling) path
        plain = select_round(fr, pol, default_budget=2)
        a = {tuple(r) for r in out.collect()}
        b = {tuple(r) for r in plain.collect()}
        assert a == b and a
    finally:
        spark.sql("DROP TABLE IF EXISTS fb_test")


def test_path_read_would_shuffle(spark):
    """Reading the same files by PATH loses bucket metadata — the plan
    grows the exchange back. Pins why read_bucketed_frontier goes
    through the catalog."""
    fr = _frontier(spark, n=1000, hosts=7)
    write_bucketed_frontier(fr, "fb_path_test", buckets=4)
    try:
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED fb_path_test")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        by_path = spark.read.parquet(loc)
        pol = spark.createDataFrame(
            [("h0", 4)], "host string, budget_per_round int"
        )
        plan = (
            select_round(by_path, pol, default_budget=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning(host" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS fb_path_test")
