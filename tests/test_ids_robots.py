"""ID grammar roundtrip (Column ↔ Python parity) and robots
longest-prefix-wins decisions."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark import ids
from crawler_spark.operators.robots import robots_filter


def test_id_format_parse_roundtrip(spark):
    rows = [(d, c, p, s) for d in (1, 42, 999) for c, p, s in [(2, 3, 4), (0, 0, 0), (123, 456, 78 % 100)]]
    df = spark.createDataFrame(rows, "d int, c int, p int, s int")
    out = df.select(
        "d", "c", "p", "s",
        ids.document_id("d").alias("doc_id"),
        ids.chapter_id("d", "c").alias("ch_id"),
        ids.page_id("d", "c", "p").alias("pg_id"),
        ids.sentence_id("d", "c", "p", "s").alias("st_id"),
    )
    parsed = out.select(
        "d", "c", "p", "s", "st_id",
        *[v.alias(k) for k, v in ids.parse_id_cols(F.col("st_id")).items()],
    ).collect()
    for r in parsed:
        assert (r["doc"], r["chapter"], r["page"], r["sentence"]) == (
            r["d"], r["c"], r["p"], r["s"],
        )
        assert r["level"] == "sentence"
        py = ids.parse_id(r["st_id"])
        assert (py["doc"], py["chapter"], py["page"], py["sentence"], py["level"]) == (
            r["d"], r["c"], r["p"], r["s"], "sentence",
        )


def test_id_levels_and_invalid(spark):
    cases = ["DSG_001", "DSG_001.002", "DSG_001.002.003", "DSG_001.002.003.04",
             "bogus", "DSG_1", "DSG_001.002.003.004"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    rows = df.select("s", *[v.alias(k) for k, v in ids.parse_id_cols(F.col("s")).items()]).collect()
    got = {r["s"]: r["level"] for r in rows}
    assert got == {
        "DSG_001": "document",
        "DSG_001.002": "chapter",
        "DSG_001.002.003": "page",
        "DSG_001.002.003.04": "sentence",
        "bogus": None,
        "DSG_1": None,  # padding is part of the grammar
        "DSG_001.002.003.004": None,  # sentence is 2 digits
    }
    for s in ("bogus", "DSG_1", "DSG_001.002.003.004"):
        assert ids.parse_id(s) is None


def test_robots_longest_prefix_wins(spark):
    robots = spark.createDataFrame(
        [
            ("a.test", "/", True),
            ("a.test", "/private", False),
            ("a.test", "/private/open", True),
            ("b.test", "/", False),
        ],
        "host string, path_prefix string, allow boolean",
    )
    cands = spark.createDataFrame(
        [
            ("a.test", "http://a.test/doc/1"),          # allow (/)
            ("a.test", "http://a.test/private/doc"),    # deny (/private)
            ("a.test", "http://a.test/private/open/x"), # allow (longest)
            ("a.test", "http://a.test/"),               # allow
            ("b.test", "http://b.test/anything"),       # deny all
            ("c.test", "http://c.test/no/rules"),       # no rules → allow
        ],
        "host string, url string",
    )
    got = {r["url"] for r in robots_filter(cands, robots).collect()}
    assert got == {
        "http://a.test/doc/1",
        "http://a.test/private/open/x",
        "http://a.test/",
        "http://c.test/no/rules",
    }


def test_robots_tie_break_allow_wins(spark):
    """RFC 9309: among equally specific matches, allow wins."""
    robots = spark.createDataFrame(
        [("t.test", "/dir", False), ("t.test", "/dir", True)],
        "host string, path_prefix string, allow boolean",
    )
    cands = spark.createDataFrame(
        [("t.test", "http://t.test/dir/x")], "host string, url string"
    )
    assert robots_filter(cands, robots).count() == 1


def test_robots_wildcard_rules(spark):
    """RFC 9309 wildcard mode: * spans any chars, trailing $ anchors,
    non-trailing $ is literal, specificity = rule-string length."""
    robots = spark.createDataFrame(
        [
            ("w.test", "/private*", False),
            ("w.test", "/private/pub$", True),   # longer → beats /private*
            ("w.test", "/a*.html$", False),
            ("w.test", "/li$eral", False),        # literal $ mid-rule
        ],
        "host string, path_prefix string, allow boolean",
    )
    cands = spark.createDataFrame(
        [
            ("w.test", "http://w.test/private/x"),     # deny
            ("w.test", "http://w.test/private/pub"),   # allow ($-rule wins)
            ("w.test", "http://w.test/private/pub2"),  # deny (no $ match)
            ("w.test", "http://w.test/ab.html"),       # deny (a*.html$)
            ("w.test", "http://w.test/ab.htmlx"),      # allow ($ anchored)
            ("w.test", "http://w.test/li$eral/x"),     # deny (literal $)
            ("w.test", "http://w.test/ok"),            # allow
        ],
        "host string, url string",
    )
    got = {r["url"] for r in robots_filter(cands, robots, wildcard=True).collect()}
    assert got == {
        "http://w.test/private/pub",
        "http://w.test/ab.htmlx",
        "http://w.test/ok",
    }


def test_robots_filter_no_candidate_shuffle(spark):
    """Scale gate: the r1 implementation windowed over every candidate
    column (full shuffle of the frontier per round). The r2 shape is a
    broadcast rules-array + higher-order match — no Window, no sort-
    merge join, no candidate-side exchange."""
    robots = spark.createDataFrame(
        [("a.test", "/x", False)], "host string, path_prefix string, allow boolean"
    )
    cands = spark.createDataFrame(
        [("a.test", "http://a.test/y")], "host string, url string"
    )
    out = robots_filter(cands, robots)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
