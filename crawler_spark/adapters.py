"""SiteAdapter — per-site behavior as data (SURVEY §2.11).

The reference's extension surface is the strategy-pattern ``Crawler``
constructor: each of 7 sites supplies hook functions
(``getMetadataBy`` seed filter, ``filterCheckpoint``/``sortCheckpoint``
frontier policy, ``getChapters`` discovery — `src/sites/registry.ts:9-54`,
`crawler.ts:57-145`). The graft inverts this: ONE generic engine, and
site behavior reduced to declarative configuration — filters are
Column expressions, sort policy is a flag, and the whole adapter is
serializable data, so "adding a site" never adds a job.

``thanhlinh.net/main.ts:41-72`` runs TWO crawlers concurrently over one
lockfile-guarded checkpoint (one ascending over chaptered docs, one
descending over the rest). Here that is two adapters alternating rounds
over one snapshot store — snapshot isolation replaces the lockfile —
and the union of their work equals a single crawler's final state
(tested: tests/test_adapters.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_spark.functions.text import (
    FOOTNOTE_CLEANUP_CHAIN,
    VERSE_CLEANUP_CHAIN,
)


@dataclass(frozen=True)
class SiteAdapter:
    """Declarative per-site crawl policy — pure data (predicates are
    SQL expression strings, so adapters serialize to JSON and need no
    live session to define).

    seed_source:   value of the ``source`` column this adapter owns
                   (seed filter F1 — ``getMetadataBy``).
    frontier_pred: optional extra frontier predicate (filterCheckpoint
                   hook) as a SQL expression; None = default
                   incomplete-only.
    priority_desc: use the O2 descending priority (sortCheckpoint desc).
    budget:        per-round politeness budget override (None = table).
    cleanup_chain: ordered step names for the markdown cleanup chain
                   (``cleanupMdProcessor``'s per-site step array — the
                   reference varies both ORDER and COMPOSITION per
                   site, e.g. augustino.net inserts a footnote-label
                   rewrite before normalizeWhitespace and notes in
                   source that the order is load-bearing). None = the
                   standard chain. Names resolve via
                   ``functions.text.CLEANUP_STEPS`` so the chain stays
                   JSON-serializable data.
    """

    name: str
    seed_source: str | None = None
    frontier_pred: str | None = None
    priority_desc: bool = False
    budget: int | None = None
    cleanup_chain: tuple[str, ...] | None = None

    def seed_filter(self) -> Column:
        if self.seed_source is None:
            return F.lit(True)
        return F.col("source") == F.lit(self.seed_source)

    def frontier_filter(self) -> Column | None:
        return F.expr(self.frontier_pred) if self.frontier_pred else None

    def cleanup(self, text_col: Column | str) -> Column:
        """The adapter's cleanup chain as a Column transform."""
        from crawler_spark.functions.text import (
            STANDARD_CLEANUP_CHAIN,
            cleanup_chain_col,
        )

        return cleanup_chain_col(
            text_col, self.cleanup_chain or STANDARD_CLEANUP_CHAIN
        )


# the thanhlinh two-crawler split (main.ts:41-72) as data
CHAPTERED_ASC = SiteAdapter(name="chaptered_asc", frontier_pred="has_chapters")
FLAT_DESC = SiteAdapter(
    name="flat_desc", frontier_pred="NOT has_chapters", priority_desc=True
)

# per-site cleanup chains as data (reference getPageContent.ts files):
# augustino.net/hdgmvietnam.com insert the footnote-label rewrite;
# ktcgkpv.org runs the short verse chain
AUGUSTINO = SiteAdapter(
    name="augustino", seed_source="augustino", cleanup_chain=FOOTNOTE_CLEANUP_CHAIN
)
KTCGKPV_VERSES = SiteAdapter(
    name="ktcgkpv_verses", seed_source="ktcgkpv", cleanup_chain=VERSE_CLEANUP_CHAIN
)
