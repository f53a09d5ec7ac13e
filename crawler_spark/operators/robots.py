"""Robots filter (north rule; absent in the reference — verified, no
robots/delay/throttle logic anywhere in ``src/``, SURVEY §2.10).

Rules table: (host, path_prefix, allow). Decision per RFC 9309:
most-specific rule wins (longest rule string); among equally specific
matches, allow wins; no match ⇒ allow. ``wildcard=True`` additionally
honors the RFC's ``*`` (any chars) and trailing ``$`` (end anchor),
with rule specificity still measured by rule-string length.

Physical shape (r2 — replaces the r1 window-over-all-columns, which
shuffled every candidate row): rules are grouped per host into an
ARRAY and broadcast; each candidate row evaluates its matches inside
higher-order functions (filter/exists over the rules array). The
candidate side never shuffles and never sorts — the only exchanges in
the plan belong to the tiny rules-table groupBy and the broadcast. At
10^10 URLs that is the difference between a map-only stage and a
full-frontier shuffle per round. Plan-gated in tests/test_ids_robots.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.canonical import host_col

_END = "\x0eEND\x0e"  # private marker for a trailing $ during conversion


def with_path(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "_path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )


def _wildcard_pattern(prefix: Column) -> Column:
    """RFC 9309 rule → anchored regex: escape regex specials, ``*`` →
    ``.*``, a TRAILING ``$`` anchors the end (non-trailing ``$`` is
    literal). Runs once per rule on the tiny rules table."""
    esc = F.regexp_replace(prefix, r"([.\^+?(){}\[\]|\\])", r"\\$1")
    esc = F.regexp_replace(esc, r"\$", r"\\\$")  # all $ → literal
    esc = F.regexp_replace(esc, r"\\\$$", _END)  # trailing $ → marker
    body = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), F.replace(body, F.lit(_END), F.lit("$")))


def robots_filter(
    candidates: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_column: str | None = "host",
    wildcard: bool = False,
) -> DataFrame:
    """Keep only robots-allowed rows. Adds nothing; drops helpers."""
    df = with_path(candidates, url_col)
    drop_host = False
    if host_column is None:
        df = df.withColumn("_host", host_col(F.col(url_col)))
        host_column = "_host"
        drop_host = True

    spec = robots.select(
        F.col("host").alias("_r_host"),
        F.col("path_prefix").alias("_spec"),
        F.col("allow").alias("_allow"),
        F.length("path_prefix").alias("_spec_len"),
    )
    if wildcard:
        spec = spec.withColumn("_pat", _wildcard_pattern(F.col("_spec")))
    grouped = F.broadcast(
        spec.groupBy("_r_host").agg(
            F.collect_list(
                F.struct(
                    *(["_pat"] if wildcard else ["_spec"]), "_allow", "_spec_len"
                )
            ).alias("_rules")
        )
    )

    j = df.join(grouped, F.col(host_column) == F.col("_r_host"), "left")
    path = F.col("_path")
    if wildcard:
        match = lambda r: F.rlike(path, r["_pat"])  # noqa: E731
    else:
        match = lambda r: path.startswith(r["_spec"])  # noqa: E731
    matched = F.filter(F.coalesce(F.col("_rules"), F.array()), match)
    best = F.array_max(F.transform(matched, lambda r: r["_spec_len"]))
    allowed = F.when(F.size(matched) == 0, F.lit(True)).otherwise(
        F.exists(matched, lambda r: (r["_spec_len"] == best) & r["_allow"])
    )
    out = j.filter(allowed).drop("_r_host", "_rules", "_path")
    if drop_host:
        out = out.drop("_host")
    return out

# ---------------------------------------------------------------------------
# robots.txt TEXT parser (RFC 9309 group semantics), fully JVM-side
# ---------------------------------------------------------------------------
#
# The filter above consumes a pre-built rules table; a real crawler has
# to BUILD that table from fetched robots.txt bodies. The reference has
# no robots handling at all (verified — SURVEY §2.10), so this is graft
# surface mandated by the north rule ("robots.txt compliance").
#
# Physical shape: one `transform` (line → key/value struct) and one
# `aggregate` (stateful group fold) per host row — a map-only
# projection with NO exchange and NO Python. robots.txt bodies are
# bounded (RFC 9309 §2.5: parse at least 500 KiB; we parse exactly the
# first 512,000 chars), so per-row cost is bounded too. At 10^7 hosts
# this is one narrow stage over a table that is ~10^-3 the size of the
# frontier.
#
# Semantics implemented (RFC 9309):
#   - groups = consecutive User-agent lines followed by rule lines; a
#     User-agent line AFTER rules starts a new group (§2.2.1)
#   - multiple groups for the same product token merge (§2.2.1)
#   - rule lines before any User-agent line are ignored
#   - product-token match is case-insensitive and exact; crawlers obey
#     the matching group if one exists, else the `*` group (§2.2.1)
#   - empty Allow/Disallow patterns match nothing → dropped (§2.2.2)
#   - `#` starts a comment; CR/CRLF/LF all accepted; BOM stripped
#   - Sitemap: lines are NOT group members — collected globally, value
#     case preserved (sitemaps.org extension, referenced by §2.2.4)
#   - Crawl-delay: de-facto extension, parsed per group (seconds,
#     fractional allowed); multiple values → the most polite (max)
_ACC_RULES_T = "array<struct<agent:string,path:string,allow:boolean>>"
_ACC_DELAYS_T = "array<struct<agent:string,delay:double>>"
_LINE_RX = r"^([A-Za-z][A-Za-z0-9-]*)\s*:\s*(.*?)\s*$"


def _acc(agents, seen, rules, delays, maps):
    return F.struct(
        agents.alias("agents"),
        seen.alias("seen"),
        rules.alias("rules"),
        delays.alias("delays"),
        maps.alias("maps"),
    )


def parse_robots(
    bodies: DataFrame,
    agent: str = "sparkbot",
    body_col: str = "body",
    host_column: str = "host",
    max_chars: int = 512_000,
) -> DataFrame:
    """(host, body) → (host, rules, crawl_delay, sitemaps), one row/host.

    ``rules`` is ``array<struct<path_prefix,allow,spec_len>>`` for the
    group that governs ``agent`` (exact case-insensitive token match,
    falling back to ``*``); explode with :func:`robots_rules_table` to
    feed :func:`robots_filter`. A null/empty/unparseable body yields an
    empty rules array — i.e. allow-all, the RFC 9309 §2.3.1 behavior
    for unavailable robots.txt.
    """
    tok = F.lit(agent.lower())
    body = F.coalesce(F.col(body_col).cast("string"), F.lit(""))
    body = F.substring(body, 1, max_chars)
    body = F.regexp_replace(body, "^﻿", "")
    lines = F.split(F.regexp_replace(body, "\r", "\n"), "\n")
    # comment-strip + trim happens inside the line regex (non-greedy
    # value group + trailing \s*); '#'-to-EOL is cut first because '#'
    # never occurs in a robots path (URL fragments are never sent)
    kv = F.transform(
        lines,
        lambda l: F.struct(
            F.lower(
                F.regexp_extract(F.trim(F.substring_index(l, "#", 1)), _LINE_RX, 1)
            ).alias("k"),
            F.regexp_extract(F.trim(F.substring_index(l, "#", 1)), _LINE_RX, 2).alias(
                "v"
            ),
        ),
    )
    init = _acc(
        F.array().cast("array<string>"),
        F.lit(False),
        F.array().cast(_ACC_RULES_T),
        F.array().cast(_ACC_DELAYS_T),
        F.array().cast("array<string>"),
    )

    def step(acc, x):
        k, v = x["k"], x["v"]
        vl = F.lower(v)
        is_ua = (k == F.lit("user-agent")) & (v != F.lit(""))
        is_rule = k.isin("allow", "disallow")
        is_delay = k == F.lit("crawl-delay")
        is_map = (k == F.lit("sitemap")) & (v != F.lit(""))
        agents = F.when(
            is_ua,
            F.when(acc["seen"], F.array(vl)).otherwise(
                F.concat(acc["agents"], F.array(vl))
            ),
        ).otherwise(acc["agents"])
        seen = F.when(is_ua, F.lit(False)).otherwise(
            F.when(is_rule | is_delay, F.lit(True)).otherwise(acc["seen"])
        )
        new_rules = F.transform(
            acc["agents"],
            lambda a: F.struct(
                a.alias("agent"), v.alias("path"), (k == F.lit("allow")).alias("allow")
            ),
        )
        rules = F.when(
            is_rule & (v != F.lit("")) & (F.size(acc["agents"]) > 0),
            F.concat(acc["rules"], new_rules),
        ).otherwise(acc["rules"])
        dval = F.when(v.rlike(r"^[0-9]+(\.[0-9]+)?$"), v.cast("double"))
        new_delays = F.transform(
            acc["agents"],
            lambda a: F.struct(a.alias("agent"), dval.alias("delay")),
        )
        delays = F.when(
            is_delay & dval.isNotNull() & (F.size(acc["agents"]) > 0),
            F.concat(acc["delays"], new_delays),
        ).otherwise(acc["delays"])
        maps = F.when(is_map, F.concat(acc["maps"], F.array(v))).otherwise(acc["maps"])
        return _acc(agents, seen, rules, delays, maps)

    acc = F.aggregate(kv, init, step)
    has_exact = F.exists(acc["rules"], lambda r: r["agent"] == tok) | F.exists(
        acc["delays"], lambda d: d["agent"] == tok
    )
    sel = F.when(has_exact, tok).otherwise(F.lit("*"))
    sel_rules = F.filter(acc["rules"], lambda r: r["agent"] == sel)
    sel_delays = F.filter(acc["delays"], lambda d: d["agent"] == sel)
    return bodies.select(
        F.col(host_column).alias("host"),
        F.transform(
            sel_rules,
            lambda r: F.struct(
                r["path"].alias("path_prefix"),
                r["allow"].alias("allow"),
                F.length(r["path"]).alias("spec_len"),
            ),
        ).alias("rules"),
        F.array_max(F.transform(sel_delays, lambda d: d["delay"])).alias(
            "crawl_delay"
        ),
        acc["maps"].alias("sitemaps"),
    )


def robots_rules_table(parsed: DataFrame) -> DataFrame:
    """Explode :func:`parse_robots` output into the (host, path_prefix,
    allow) rules table :func:`robots_filter` consumes (pass
    ``wildcard=True`` — robots.txt patterns use ``*``/``$``)."""
    return parsed.select(
        "host", F.explode("rules").alias("r")
    ).select("host", F.col("r.path_prefix"), F.col("r.allow"))


def sitemap_seeds(parsed: DataFrame) -> DataFrame:
    """Explode the Sitemap: directives → (host, sitemap_url)."""
    return parsed.select(
        "host", F.explode("sitemaps").alias("sitemap_url")
    ).dropDuplicates(["host", "sitemap_url"])


def budgets_from_delays(
    parsed: DataFrame,
    politeness: DataFrame,
    round_period_s: float = 60.0,
    default_budget: int = 2,
) -> DataFrame:
    """Fold parsed Crawl-delay into the politeness dim: a host's
    per-round budget becomes ``min(configured, floor(period/delay))``,
    floored at 1 so a long delay throttles to one fetch per round
    rather than starving the host forever. Hosts without a delay keep
    their configured budget; hosts with a delay but no configured row
    get ``min(default, floor(period/delay))``. Broadcast-sized join —
    both sides are per-host dims."""
    d = parsed.select("host", "crawl_delay").filter(F.col("crawl_delay").isNotNull())
    merged = politeness.join(d, "host", "full")
    from_delay = F.greatest(
        F.floor(F.lit(float(round_period_s)) / F.col("crawl_delay")).cast("int"),
        F.lit(1),
    )
    budget = F.when(
        F.col("crawl_delay").isNull(),
        F.coalesce(F.col("budget_per_round"), F.lit(default_budget)),
    ).otherwise(
        F.least(
            F.coalesce(F.col("budget_per_round"), F.lit(default_budget)), from_delay
        )
    )
    return merged.select("host", budget.cast("int").alias("budget_per_round"))
