"""Politeness round-selector + priority ordering (SURVEY §4 custom #1).

The reference enforces politeness only implicitly — a strictly
sequential one-page-in-flight loop per site (``crawler.ts:292-510``,
``commands/impl.ts:42-62``). The graft makes it explicit: the frontier
is hash-partitioned by host, and each round takes the top
``budget_per_round`` eligible URLs per host, ordered by the reference's
priority key (requires_manual_check false-first, document_number asc —
``src/lib/crawler/sortUtils.ts:9-21``) extended with (depth, url)
tiebreaks so the order is total and parallel-schedule-invariant.

Pure DataFrame ops: a broadcast join against the politeness dim and one
window rank per host — a single shuffle on `host`, which is exactly the
partitioning the subsequent per-host fetch stage needs (the shuffle is
reused, not repeated). Skew from a dominant host is handled by AQE +
the salt column (`host_salt`) carried on the frontier for downstream
stages whose work per URL is heavy (fetch/parse), where per-host
ordering no longer matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_ATTEMPTS = 5  # mirrors the reference's retry budget (getPageContent.ts:45-52)

PRIORITY_COLS = ["requires_manual_check", "document_number", "depth", "url"]


def priority_order(descending: bool = False):
    """The total priority ordering (sortUtils.ts:9-21; descending
    variant :27-39 — manual-check stays false-first in BOTH directions,
    only the document-number key flips) + graft tiebreaks for totality."""
    if descending:
        return [
            F.col("requires_manual_check").cast("int").asc(),
            F.col("document_number").desc(),
            F.col("depth").asc(),
            F.col("url").desc(),
        ]
    return [
        F.col("requires_manual_check").cast("int").asc(),
        F.col("document_number").asc(),
        F.col("depth").asc(),
        F.col("url").asc(),
    ]


def eligible(frontier: DataFrame) -> DataFrame:
    """Incomplete, attempts under budget (filterUtils.ts:7-11 analog).
    This predicate pushes down to the parquet/Iceberg scan."""
    return frontier.filter(
        (~F.col("completed")) & (F.col("attempts") < F.lit(MAX_ATTEMPTS))
    )


def budget_cap(politeness: DataFrame, default_budget: int = 2) -> int:
    """max budget across hosts — the constant rank cap for
    :func:`select_round`. The politeness table is static across rounds,
    so callers (CrawlEngine) compute this ONCE at init instead of
    paying a driver-blocking aggregate job per round."""
    row = politeness.agg(F.max("budget_per_round").alias("m")).first()
    return max(int(row["m"] or 0), default_budget)


def select_round(
    frontier: DataFrame,
    politeness: DataFrame,
    default_budget: int = 2,
    extra_filter=None,
    descending: bool = False,
    force_all: bool = False,
    force_ids=None,
    cap: int | None = None,
) -> DataFrame:
    """Per-host top-k politeness selection for one crawl round.

    ``extra_filter``: optional Column — a SiteAdapter's frontier
    predicate (filterCheckpoint hook, crawler.ts:60-69).
    ``descending``: the O2 priority variant (sortUtils.ts:27-39).
    ``force_all`` / ``force_ids`` — the F4 re-crawl escape hatches
    (checkpoint.ts:24-27,159-171): ``force_all`` selects EVERY frontier
    row regardless of completion/attempts; a non-empty ``force_ids``
    selects exactly those doc_ids. Like the reference's else-if chain,
    a force override also bypasses ``extra_filter`` (filterCheckpoint
    only applies when no force is given).
    ``cap``: precomputed :func:`budget_cap` — pass it when calling per
    round so the constant-rank cap does not re-run an eager aggregate
    job every call (CrawlEngine computes it once at init).
    Returns the scheduled rows with ``host_rank`` (1-based priority rank
    within host) and ``attempt`` (this round's attempt number).
    """
    if force_all:
        elig = frontier
    elif force_ids:
        elig = frontier.filter(F.col("doc_id").isin(list(force_ids)))
    else:
        elig = eligible(frontier)
        if extra_filter is not None:
            elig = elig.filter(extra_filter)
    # hosts must be unique in the politeness dim: a duplicate host row
    # would duplicate every scheduled row through the join (degenerate
    # either way — r2 ranked after the join, corrupting ranks instead)
    pol = F.broadcast(
        politeness.select("host", "budget_per_round").dropDuplicates(["host"])
    )
    # constant rank cap = max budget across hosts. Ranking against a
    # CONSTANT lets Catalyst insert a partial WindowGroupLimit BEFORE
    # the host exchange, so each map task ships at most `cap` rows per
    # host instead of the host's whole eligible set — at 10^10 frontier
    # rows with budgets of a few URLs/host/round, the politeness
    # shuffle carries O(hosts × cap), not O(open frontier). The exact
    # per-host budget filter still applies after (cap ≥ every budget,
    # so results are identical). Plan-gated in tests/test_plans.py.
    if cap is None:
        cap = budget_cap(politeness, default_budget)
    w = Window.partitionBy("host").orderBy(*priority_order(descending))
    return (
        elig.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= F.lit(cap))
        .join(pol, on="host", how="left")
        .withColumn(
            "budget", F.coalesce(F.col("budget_per_round"), F.lit(default_budget))
        )
        .filter(F.col("host_rank") <= F.col("budget"))
        .withColumn("attempt", F.col("attempts") + F.lit(1))
        .drop("budget_per_round", "budget")
    )


def adapt_budgets(
    round_log: DataFrame,
    politeness: DataFrame,
    *,
    max_budget: int = 8,
    default_budget: int = 2,
    error_rate_cut: float = 0.5,
    latency_cut_ms: float = 5000.0,
) -> DataFrame:
    """AIMD per-host budget adaptation from one round's fetch outcomes.

    The reference's fixed one-in-flight loop never adapts; a production
    crawler follows the standard congestion-control shape (the same
    additive-increase / multiplicative-decrease rule TCP and the
    Heritrix/Nutch politeness valves use): a host that served the whole
    round cleanly earns +1 budget (capped at ``max_budget``); a host
    that throttled (any 429), errored heavily (5xx/network failures ≥
    ``error_rate_cut`` of its fetches) or slowed past ``latency_cut_ms``
    is halved (floored at 1 — never banned outright, so recovery is
    observable). Hosts idle this round keep their budget.

    Physical shape: one partial-aggregable groupBy(host) over the
    round's log (counts + avg pre-combine map-side) and one host-keyed
    outer join against the O(hosts) politeness dim — no window, no
    Python. The outer join admits hosts the dim has never seen (they
    enter at ``default_budget`` before the rule applies).
    """
    sig = round_log.groupBy("host").agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_if(
            (F.col("status") == 429)
            | (F.col("status") >= 500)
            | (F.col("status") == 0)
        ).alias("_err"),
        F.count_if(F.col("status") == 429).alias("_throttled"),
        F.avg("latency_ms").alias("_lat"),
    )
    cur = F.coalesce(F.col("budget_per_round"), F.lit(default_budget))
    unhealthy = (
        (F.col("_throttled") > 0)
        | (F.col("_err") >= F.col("_n") * F.lit(error_rate_cut))
        | (F.col("_lat") > F.lit(latency_cut_ms))
    )
    new_budget = (
        F.when(F.col("_n").isNull(), cur)  # idle host: unchanged
        .when(unhealthy, F.greatest(F.floor(cur / 2), F.lit(1)))
        .otherwise(F.least(cur + 1, F.lit(max_budget)))
    )
    return (
        politeness.select("host", "budget_per_round")
        .dropDuplicates(["host"])
        .join(sig, on="host", how="full")
        .select("host", new_budget.cast("int").alias("budget_per_round"))
    )
