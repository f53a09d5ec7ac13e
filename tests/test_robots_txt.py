"""robots.txt TEXT parser (RFC 9309 group semantics).

Gate strategy: an independent pure-Python reference parser lives in
this file (written straight from the RFC, sharing no code with the
Spark fold); targeted semantic fixtures plus a hypothesis fuzz compare
the two, and a plan test pins the map-only shape.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark.operators.robots import (
    budgets_from_delays,
    parse_robots,
    robots_filter,
    robots_rules_table,
    sitemap_seeds,
)

AGENT = "sparkbot"


# --- independent reference implementation (pure Python, from RFC 9309) ---


def ref_parse(body: str, agent: str = AGENT, max_chars: int = 512_000):
    body = (body or "")[:max_chars]
    if body.startswith("﻿"):
        body = body[1:]
    groups: dict[str, dict] = {}  # agent -> {rules: [(path, allow)], delays: []}
    sitemaps: list[str] = []
    cur: list[str] = []
    seen_rule = False
    for raw in body.replace("\r", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        k, _, v = line.partition(":")
        k, v = k.strip().lower(), v.strip()
        if not k or not k[0].isalpha() or not all(
            c.isalnum() or c == "-" for c in k
        ):
            continue
        if k == "user-agent" and v:
            if seen_rule:
                cur = [v.lower()]
                seen_rule = False
            else:
                cur.append(v.lower())
        elif k in ("allow", "disallow"):
            seen_rule = True
            if v and cur:
                for a in cur:
                    groups.setdefault(a, {"rules": [], "delays": []})["rules"].append(
                        (v, k == "allow")
                    )
        elif k == "crawl-delay":
            seen_rule = True
            ok = re.fullmatch(r"[0-9]+(\.[0-9]+)?", v) is not None
            d = float(v) if ok else None
            if ok and cur:
                for a in cur:
                    groups.setdefault(a, {"rules": [], "delays": []})["delays"].append(
                        d
                    )
        elif k == "sitemap" and v:
            sitemaps.append(v)
    g = groups.get(agent.lower()) or groups.get("*") or {"rules": [], "delays": []}
    delay = max(g["delays"]) if g["delays"] else None
    return g["rules"], delay, sitemaps


def spark_parse(spark, body: str):
    df = spark.createDataFrame([("h.example", body)], "host string, body string")
    row = parse_robots(df, agent=AGENT).first()
    rules = [(r["path_prefix"], r["allow"]) for r in row["rules"]]
    return rules, row["crawl_delay"], list(row["sitemaps"])


FIXTURE = """\
﻿# top comment
Sitemap: https://h.example/SiteMap-1.xml.gz

User-Agent: googlebot
Disallow: /private
Crawl-delay: 10

user-agent: sparkbot
user-agent: otherbot
Allow: /a   # inline comment
Disallow: /a/b
Crawl-Delay: 2.5

User-agent: *
Disallow: /

User-agent: sparkbot
Disallow: /extra
Disallow:
sitemap: https://h.example/sitemap2.xml
"""


def test_group_semantics_fixture(spark):
    rules, delay, maps = spark_parse(spark, FIXTURE)
    # exact-token groups merge across the file; * group ignored
    assert rules == [("/a", True), ("/a/b", False), ("/extra", False)]
    assert delay == 2.5
    assert maps == [
        "https://h.example/SiteMap-1.xml.gz",
        "https://h.example/sitemap2.xml",
    ]
    assert ref_parse(FIXTURE) == (rules, delay, maps)


def test_star_fallback_and_allow_all(spark):
    body = "User-agent: megabot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp\n"
    rules, delay, _ = spark_parse(spark, body)
    assert rules == [("/tmp", False)] and delay is None
    # no matching group at all → empty rules → allow-all downstream
    rules, _, _ = spark_parse(spark, "User-agent: megabot\nDisallow: /\n")
    assert rules == []
    # null/empty body (robots.txt 404) → allow-all
    rules, _, _ = spark_parse(spark, "")
    assert rules == []


def test_rules_before_any_group_ignored_crlf(spark):
    body = "Disallow: /orphan\r\nUser-agent: sparkbot\r\nDisallow: /x\r\n"
    rules, _, _ = spark_parse(spark, body)
    assert rules == [("/x", False)]


def test_ua_after_rules_starts_new_group(spark):
    body = (
        "User-agent: sparkbot\nDisallow: /x\n"
        "User-agent: second\nDisallow: /y\n"
    )
    rules, _, _ = spark_parse(spark, body)
    assert rules == [("/x", False)]  # /y belongs to the NEW group


def test_end_to_end_filter(spark):
    bodies = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /priv\nAllow: /priv/ok$\n"),
            ("b.example", None),
        ],
        "host string, body string",
    )
    rules = robots_rules_table(parse_robots(bodies, agent=AGENT))
    cands = spark.createDataFrame(
        [
            ("a.example", "https://a.example/priv/ok"),
            ("a.example", "https://a.example/priv/no"),
            ("a.example", "https://a.example/pub"),
            ("b.example", "https://b.example/anything"),
        ],
        "host string, url string",
    )
    got = {r["url"] for r in robots_filter(cands, rules, wildcard=True).collect()}
    assert got == {
        "https://a.example/priv/ok",
        "https://a.example/pub",
        "https://b.example/anything",
    }


def test_budgets_from_delays(spark):
    parsed = spark.createDataFrame(
        [("slow.example", 30.0), ("fast.example", 0.1), ("huge.example", 600.0)],
        "host string, crawl_delay double",
    )
    pol = spark.createDataFrame(
        [("slow.example", 8), ("fast.example", 8), ("nodelay.example", 5)],
        "host string, budget_per_round int",
    )
    got = {
        r["host"]: r["budget_per_round"]
        for r in budgets_from_delays(parsed, pol, round_period_s=60.0).collect()
    }
    # 60/30=2 caps 8; 60/0.1=600 leaves 8; 60/600 floors at 1;
    # no-delay host keeps config; delay-only host gets min(default, cap)
    assert got == {
        "slow.example": 2,
        "fast.example": 8,
        "huge.example": 1,
        "nodelay.example": 5,
    }


def test_sitemap_seeds_dedup(spark):
    bodies = spark.createDataFrame(
        [("h", "Sitemap: https://h/s.xml\nSitemap: https://h/s.xml\n")],
        "host string, body string",
    )
    rows = sitemap_seeds(parse_robots(bodies)).collect()
    assert [(r["host"], r["sitemap_url"]) for r in rows] == [("h", "https://h/s.xml")]


def test_parse_is_map_only(spark):
    bodies = spark.createDataFrame(
        [("h", FIXTURE)], "host string, body string"
    )
    plan = parse_robots(bodies)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


_LINE = st.one_of(
    st.sampled_from(
        [
            "User-agent: sparkbot",
            "User-agent: otherbot",
            "User-agent: *",
            "user-AGENT: SparkBot",
            "Disallow: /a",
            "Disallow: /a/*.php$",
            "Allow: /a/b",
            "Allow:",
            "Disallow:",
            "Crawl-delay: 3",
            "Crawl-delay: 0.5",
            "Crawl-delay: nan",
            "Sitemap: https://h/s.xml",
            "# comment",
            "",
            "   ",
            "junk without colon",
            "Unknown-directive: x",
            "Disallow: /c # trailing",
        ]
    ),
    st.text(
        alphabet="Uusera-gntDislowAC:/*$#. \t", min_size=0, max_size=24
    ),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_LINE, min_size=0, max_size=30), st.sampled_from(["\n", "\r\n"]))
def test_fuzz_matches_reference(spark, lines, sep):
    body = sep.join(lines)
    assert spark_parse(spark, body) == ref_parse(body)
