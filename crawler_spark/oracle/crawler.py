"""Sequential golden-oracle crawler.

A literal, single-threaded transcription of the scheduling semantics the
Spark engine must reproduce (SURVEY §3.1 steps 4-6):

  * seed init: validity filter (quarantine, ``crawlerUtils.ts:22-37``),
    ``source_type == 'web'`` seed filter (``thanhlinh.net/main.ts:15-19``),
    canonicalization, robots filter, first-wins dedup
    (``getMetadataList.ts:197``; checkpoint-id merge
    ``checkpoint.ts:100-114``);
  * round scheduling: incomplete-only (``filterUtils.ts:7-11``), priority
    sort (requires_manual_check false-first, then document_number asc —
    ``sortUtils.ts:9-21``; graft adds depth + canonical-url tiebreaks so
    the order is total), per-host politeness budget (graft-explicit;
    the reference's analog is its strictly-sequential fetch loop,
    ``crawler.ts:292-510``);
  * fetch: attempts 1..fail_rounds fail (transient), success marks
    ``completed`` (``checkpoint.ts:203-288``); MAX_ATTEMPTS=5 mirrors
    the reference's retry-5 budget (``getPageContent.ts:45-52``);
  * discovery (depth 0, has_chapters only — lazy subtask expansion,
    ``crawler.ts:219-276``): markdown links, self-link cycle guard
    (``rongmotamhon.net/getChapters.ts:52-57``), derived-key first-wins
    dedup ``url.split('_')[-2]`` (``getChapters.ts:69``), robots filter,
    then URL-seen anti-join before enqueue;
  * extraction: every page yields (caption, image_url) pairs in document
    order via the shared ``reMdImg`` semantics (``mdUtils.ts:5``).

Global crawl order (the golden ordering): rounds ascending; within a
round, hosts in lexicographic order; within a host, priority order.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from crawler_spark.canonical import canonicalize, host_of, resolve_url
from crawler_spark.functions.text import MD_IMG_RE, extract_md_images
from crawler_spark.oracle.fixtures import MAX_ATTEMPTS, World, robots_allowed

# escape-aware twin of rounds.MD_LINK_PAT (r5): \[escaped\] is text
MD_LINK_RE = re.compile(r"(?<!!)(?<!\\)\[((?:\\.|[^\]\\])*)\]\(([^)]*)\)")


def derived_chapter_key(url: str) -> str | None:
    """``link.split('_').at(-2)`` (getChapters.ts:69); None when the url
    has fewer than 2 underscore segments (JS ``.at(-2)`` → undefined)."""
    parts = url.split("_")
    return parts[-2] if len(parts) >= 2 else None


def path_of(canonical_url: str) -> str:
    m = re.match(r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", canonical_url)
    return m.group(1) or "/" if m else "/"


@dataclass
class Entry:
    url: str  # canonical
    host: str
    depth: int
    requires_manual_check: bool
    document_number: int
    discovered_round: int
    doc_id: str
    completed: bool = False
    attempts: int = 0


@dataclass
class OracleResult:
    crawl_order: list[dict] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    extractions: list[dict] = field(default_factory=list)
    frontier: list[Entry] = field(default_factory=list)
    quarantined: int = 0
    metrics: list[dict] = field(default_factory=list)


def valid_seed(row: dict) -> bool:
    """Schema validity (zod-analog): genre A-Z letter, non-negative
    document number, known source_type."""
    return (
        bool(re.fullmatch(r"[A-Z]", str(row.get("genre_code", ""))))
        and int(row.get("document_number", -1)) >= 0
        and row.get("source_type") in {"web", "pdf", "hardCopy"}
    )


def run_oracle(
    world: World, max_rounds: int = 100, default_budget: int = 2
) -> OracleResult:
    res = OracleResult()
    seen: set[str] = set()
    frontier: list[Entry] = []

    # ---- seed init ---------------------------------------------------------
    for row in sorted(world.seeds, key=lambda r: r["seq"]):
        if not valid_seed(row):
            res.quarantined += 1
            continue
        if row["source_type"] != "web":
            continue
        cu = canonicalize(row["source_url"])
        if not robots_allowed(world, host_of(cu), path_of(cu)):
            continue
        if cu in seen:
            continue  # first-wins
        seen.add(cu)
        frontier.append(
            Entry(
                url=cu,
                host=host_of(cu),
                depth=0,
                requires_manual_check=bool(row["requires_manual_check"]),
                document_number=int(row["document_number"]),
                discovered_round=0,
                doc_id=row["document_id"],
            )
        )
    seeds_by_url = {e.url: e for e in frontier}
    has_chapters_by_url = {
        canonicalize(r["source_url"]): bool(r["has_chapters"])
        for r in sorted(world.seeds, key=lambda s: s["seq"])
        if valid_seed(r) and r["source_type"] == "web"
    }

    # ---- rounds ------------------------------------------------------------
    seq = 0
    for rnd in range(1, max_rounds + 1):
        eligible = [e for e in frontier if not e.completed and e.attempts < MAX_ATTEMPTS]
        if not eligible:
            break
        by_host: dict[str, list[Entry]] = {}
        for e in eligible:
            by_host.setdefault(e.host, []).append(e)
        scheduled: list[tuple[Entry, int]] = []
        for host in sorted(by_host):
            budget = world.politeness.get(host, default_budget)
            ordered = sorted(
                by_host[host],
                key=lambda e: (
                    e.requires_manual_check,  # False first (sortUtils.ts:9-21)
                    e.document_number,
                    e.depth,
                    e.url,
                ),
            )
            for rank, e in enumerate(ordered[:budget], start=1):
                scheduled.append((e, rank))

        m = {
            "round": rnd,
            "scheduled": len(scheduled),
            "fetched_ok": 0,
            "failed": 0,
            "discovered": 0,
            "robots_dropped": 0,
            "dedup_dropped": 0,
        }
        for e, rank in scheduled:
            e.attempts += 1
            seq += 1
            page = world.pages.get(e.url)
            success = page is not None and e.attempts > page.fail_rounds
            res.crawl_order.append(
                {
                    "seq": seq,
                    "round": rnd,
                    "host": e.host,
                    "host_rank": rank,
                    "url": e.url,
                    "depth": e.depth,
                    "success": success,
                    "attempt": e.attempts,
                }
            )
            if not success:
                m["failed"] += 1
                continue
            m["fetched_ok"] += 1
            e.completed = True
            # extraction: image+caption pairs in document order
            for order, (caption, link) in enumerate(
                extract_md_images(page.body), start=1
            ):
                res.extractions.append(
                    {
                        "page_url": e.url,
                        "caption": caption,
                        "img_url": canonicalize(resolve_url(e.url, link)),
                        "img_order": order,
                    }
                )
            # discovery (lazy chapter expansion at depth 0 only)
            if e.depth == 0 and has_chapters_by_url.get(e.url, False):
                seen_keys: set[str | None] = set()
                for _text, link in MD_LINK_RE.findall(page.body):
                    cu = canonicalize(resolve_url(e.url, link))
                    if cu == e.url:
                        continue  # cycle guard (getChapters.ts:52-57)
                    key = derived_chapter_key(cu)
                    if key in seen_keys:
                        m["dedup_dropped"] += 1
                        continue  # derived-key first-wins (getChapters.ts:69)
                    seen_keys.add(key)
                    if not robots_allowed(world, host_of(cu), path_of(cu)):
                        m["robots_dropped"] += 1
                        continue
                    if cu in seen:
                        m["dedup_dropped"] += 1
                        continue
                    seen.add(cu)
                    ne = Entry(
                        url=cu,
                        host=host_of(cu),
                        depth=e.depth + 1,
                        requires_manual_check=e.requires_manual_check,
                        document_number=e.document_number,
                        discovered_round=rnd,
                        doc_id=e.doc_id,
                    )
                    frontier.append(ne)
                    m["discovered"] += 1
        res.metrics.append(m)

    res.url_seen = seen
    res.frontier = frontier
    _ = seeds_by_url
    return res
