"""Crawl-trap guards — URL-shape heuristics + per-host admission caps.

The reference crawls a fixed, hand-curated seed list (data/main.tsv →
per-site getMetadataList), so it never meets a spider trap. An open
10^10-URL frontier does: calendar pages that paginate forever, symlink
loops that mint `/a/b/a/b/a/b/...`, session-id URL aliases that make one
page look like millions, and query-string combinatorics. Left unguarded
these dominate the frontier — the classic failure mode is one trap host
holding 99% of frontier rows.

Two independent guards, both shuffle-free on the admission path:

  * :func:`trap_flags_col` / :func:`trap_filter` — per-URL shape
    heuristics as pure JVM column expressions (whole-stage codegen; the
    Python mirror :func:`trap_reasons` keeps the sequential oracle in
    agreement). Flagged URLs are QUARANTINED with a reason, never
    silently dropped — same policy as the seed quarantine (F7).
  * :func:`cap_admissions_per_host` — bounds how many NEW URLs one host
    may add to the frontier per round. Uses the same constant-rank
    WindowGroupLimit shape as politeness selection (rank pushes into a
    partial per-partition top-k, so the exchange carries O(hosts × cap)
    rows, not the trap host's millions).

Defaults are deliberately loose (they must never fire on legitimate
deep sites); a production crawl tightens them per-host via the
politeness table, not by editing code.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Shape limits. Applied to CANONICAL urls (scheme://host/path?query).
MAX_URL_LEN = 2048
MAX_PATH_SEGMENTS = 16
MAX_QUERY_PARAMS = 10
#: one path segment repeated ≥3× consecutively (`/a/b/a/b` is fine;
#: `/x/x/x` or `/a/b/a/b/a/b` when the repeat unit is one segment is not)
_REPEAT_PAT = r"(/[^/?#]+)\1{2,}"
#: ≥6 all-numeric path segments — endless calendar/pagination descent
_CALENDAR_PAT = r"^[a-z][a-z0-9+.-]*://[^/]*(?:/[^/]*){0,}?(?:/\d+){6,}"
#: session-id aliases (path `;jsessionid=` and common query keys)
_SESSION_PAT = r"(?i)(;jsessionid=|[?&](?:jsessionid|phpsessid|sessionid|sid|aspsessionid[a-z]*)=)"

_FLAGS = ("too_long", "too_deep", "repeated_segment", "query_blowup", "session_alias", "calendar")


def _path_col(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def trap_flags_col(url: Column | str) -> Column:
    """Struct of the six trap heuristics over a canonical URL — pure
    built-in expressions, no UDF, no shuffle."""
    u = F.col(url) if isinstance(url, str) else url
    path = _path_col(u)
    query = F.regexp_extract(u, r"(\?[^#]*)", 1)
    n_segs = F.size(F.split(path, "/")) - 1
    n_params = F.when(
        F.length(query) > 0, F.size(F.split(F.substring(query, 2, 1 << 20), "&"))
    ).otherwise(F.lit(0))
    return F.struct(
        (F.length(u) > MAX_URL_LEN).alias("too_long"),
        (n_segs > MAX_PATH_SEGMENTS).alias("too_deep"),
        path.rlike(_REPEAT_PAT).alias("repeated_segment"),
        (n_params > MAX_QUERY_PARAMS).alias("query_blowup"),
        u.rlike(_SESSION_PAT).alias("session_alias"),
        u.rlike(_CALENDAR_PAT).alias("calendar"),
    )


def trap_reason_col(url: Column | str) -> Column:
    """Comma-joined names of the flags that fired ('' = clean)."""
    flags = trap_flags_col(url)
    return F.concat_ws(
        ",", *[F.when(flags[n], F.lit(n)) for n in _FLAGS]
    )


def trap_filter(df: DataFrame, url_col: str = "url") -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split. Quarantined rows carry `trap_reason`.
    One projection + one filter each — Catalyst merges the struct into
    both branches' codegen; no shuffle, no cache dependency."""
    with_reason = df.withColumn("trap_reason", trap_reason_col(url_col))
    clean = with_reason.filter(F.col("trap_reason") == "").drop("trap_reason")
    trapped = with_reason.filter(F.col("trap_reason") != "")
    return clean, trapped


# --------------------------------------------------------------- python twin
def trap_reasons(url: str) -> list[str]:
    """Sequential-oracle mirror of :func:`trap_flags_col` (tested for
    exact agreement on an adversarial corpus)."""
    reasons = []
    m = re.match(r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = m.group(1) if m else ""
    qm = re.search(r"(\?[^#]*)", url)
    query = qm.group(1) if qm else ""
    if len(url) > MAX_URL_LEN:
        reasons.append("too_long")
    if path.count("/") > MAX_PATH_SEGMENTS:
        reasons.append("too_deep")
    if re.search(_REPEAT_PAT, path):
        reasons.append("repeated_segment")
    if query and len(query[1:].split("&")) > MAX_QUERY_PARAMS:
        reasons.append("query_blowup")
    if re.search(_SESSION_PAT, url):
        reasons.append("session_alias")
    if re.search(_CALENDAR_PAT, url):
        reasons.append("calendar")
    return reasons


# ------------------------------------------------------------ host admission
def cap_admissions_per_host(
    candidates: DataFrame,
    cap: int,
    host_col_name: str = "host",
    order_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(admitted, deferred): at most ``cap`` new URLs per host enter the
    frontier this round; the overflow is returned (a caller may re-offer
    it next round or drop it — a trap host's overflow just keeps losing).

    Deterministic: ranks by ``order_cols`` (default ["url"] — pass the
    priority key first and a unique tiebreaker last). The constant-literal rank
    bound lets Spark run a per-partition partial WindowGroupLimit before
    the exchange, so the shuffle carries O(hosts × cap) rows — the same
    plan shape politeness selection is gated on."""
    w = Window.partitionBy(host_col_name).orderBy(
        *[F.col(c) for c in (order_cols or ["url"])]
    )
    ranked = candidates.withColumn("_r", F.row_number().over(w))
    admitted = ranked.filter(F.col("_r") <= F.lit(cap)).drop("_r")
    deferred = ranked.filter(F.col("_r") > F.lit(cap)).drop("_r")
    return admitted, deferred
