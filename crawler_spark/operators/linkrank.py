"""Link-graph importance (PageRank) for frontier prioritization.

The reference's crawl order is a static per-site priority key
(sortUtils.ts:9-21 — manual-check flag, then document number); an open
web crawl at 10^10 URLs orders its frontier by link-graph importance so
bandwidth lands on pages the corpus actually references (the classic
crawl-scheduling result: Cho, Garcia-Molina & Page, "Efficient crawling
through URL ordering", WWW 1998; online variants: OPIC, Abiteboul et
al., WWW 2003). This operator computes the standard damped PageRank by
power iteration, Spark-shaped:

  * the edge table is weighted ONCE (src out-degree folded into an
    ``inv_deg`` column) and localCheckpoint'd — per iteration only the
    O(nodes) rank table moves;
  * each iteration = exactly two hash shuffles: ranks join the weighted
    edges on ``src``, contributions aggregate on ``dst`` (both partial-
    aggregable; no window, no Python, no driver-side graph);
  * dangling mass (nodes without outlinks) is recovered from the scalar
    identity ``dangling = total − Σ contributions`` — one lightweight
    driver agg per iteration, the same O(rounds) driver cost any
    fixed-point loop pays;
  * ``localCheckpoint(eager=True)`` per iteration cuts plan lineage
    (the iterative-Spark trap — same care as operators/components.py).

Ranks sum to 1 (within float error) every iteration, which the tests
pin alongside exact agreement with a dense numpy oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    d: float = 0.85,
    iters: int = 20,
    tol: float | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) over every node in ``edges`` (directed; duplicate
    edges collapse — a page linking twice votes once, matching the
    discovery stage's per-page link dedup). Uniform init, uniform
    dangling redistribution, damping ``d``.

    ``iters`` fixed sweeps by default; pass ``tol`` to stop early when
    the L1 delta drops below it (adds one join+agg per iteration — at
    10^10 nodes prefer the fixed budget and skip the delta check).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    ew = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("inv_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - d) / n
    for _ in range(iters):
        contribs = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("rank") * F.col("inv_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # Σ contrib = mass held by non-dangling nodes → dangling = 1 − Σ
        flowed = contribs.agg(F.sum("contrib")).first()[0] or 0.0
        dangling = max(0.0, 1.0 - flowed)
        new_ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "_new")
                .join(ranks, "node")
                .agg(F.sum(F.abs(F.col("_new") - F.col("rank"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def priority_from_rank(ranks: DataFrame, *, decades: int = 12) -> DataFrame:
    """(node, priority): a MAP-ONLY monotone transform of rank into an
    ascending integer scheduling key (0 = most important) — directly
    usable as ``document_number`` or, rescaled, as
    ``enqueue_discovered``'s sitemap-style priority.

    priority = round(−100·log10(rank)), clamped to ``decades`` orders
    of magnitude. Log-bucketing matches how PageRank mass is actually
    distributed (power law: absolute differences near the top matter,
    differences deep in the tail don't) and needs NO global sort — an
    ntile/percent_rank bucketing would funnel the whole O(nodes) table
    through one sort partition, which is exactly the plan shape this
    repo gates against."""
    hi = decades * 100
    pri = F.round(F.lit(-100.0) * F.log10(F.col("rank")))
    return ranks.select(
        "node",
        F.least(F.greatest(pri, F.lit(0)), F.lit(hi)).cast("int").alias("priority"),
    )
