"""PII scrubbing: precedence, parity, idempotence (functions/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.pii import scrub_pii, scrub_pii_col

CASES = [
    ("mail me at jo.do+x@sub.example.org now", "mail me at <EMAIL> now"),
    # SSN must redact as <ID>, not be eaten by the looser phone rule
    ("ssn 123-45-6789 ok", "ssn <ID> ok"),
    ("call +1 (555) 010-9999 today", "call <PHONE> today"),
    # all three + digits in the email local part
    (
        "u2@ex.io / 987-65-4321 / 555-123-4567",
        "<EMAIL> / <ID> / <PHONE>",
    ),
    ("no pii here.", "no pii here."),
    ("", ""),
]


def test_python_mirror_cases():
    for src, want in CASES:
        assert scrub_pii(src) == want, src


def test_scrub_idempotent():
    for src, _ in CASES:
        once = scrub_pii(src)
        assert scrub_pii(once) == once


def test_column_matches_python_mirror(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)], "i int, t string")
    got = {r["i"]: r["s"] for r in df.select("i", scrub_pii_col("t").alias("s")).collect()}
    for i, (src, want) in enumerate(CASES):
        assert got[i] == want == scrub_pii(src)


def test_jvm_only_plan(spark):
    """The scrub chain must stay in whole-stage codegen: no Python
    eval nodes in the plan."""
    df = spark.createDataFrame([("a@b.co",)], "t string").select(
        scrub_pii_col("t").alias("s")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
