"""Revisit scheduler: Cho/Garcia-Molina change-rate estimator."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.revisit import (
    due_now,
    observations_from_fetch,
    revisit_schedule,
)


def _ts(s):
    return datetime(2024, 1, 1, tzinfo=timezone.utc).fromtimestamp(
        1704067200 + s, tz=timezone.utc
    )


def _hist(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), c) for (u, t, c) in rows],
        "url string, fetch_ts timestamp, changed boolean",
    )


def ref_lambda(n, x, span):
    if span <= 0:
        return None
    return -math.log((n - x + 0.5) / (n + 0.5)) / (span / (n - 1))


def test_estimator_matches_paper_formula(spark):
    # u1: 5 visits over 4 days, 3 changes; u2: never changes;
    # u3: always changes; u4: single visit unchanged; u5: single changed
    day = 86400
    rows = (
        [("u1", i * day, c) for i, c in enumerate([True, False, True, True, False])]
        + [("u2", i * day, False) for i in range(4)]
        + [("u3", i * day, True) for i in range(4)]
        + [("u4", 0, False), ("u5", 0, True)]
    )
    got = {
        r["url"]: r
        for r in revisit_schedule(
            _hist(spark, rows), min_interval_s=3600.0, max_interval_s=30 * day
        ).collect()
    }
    lam1 = ref_lambda(5, 3, 4 * day)
    assert got["u1"]["lambda_per_s"] == pytest.approx(lam1, rel=1e-9)
    assert got["u1"]["interval_s"] == pytest.approx(1 / lam1, rel=1e-9)
    assert got["u1"]["visits"] == 5 and got["u1"]["changes"] == 3
    # never-changed → lambda 0 → clamped to max interval
    assert got["u2"]["lambda_per_s"] == 0.0
    assert got["u2"]["interval_s"] == 30 * day
    # always-changed λ̂ = -ln(0.5/4.5)/day → interval ≈ 0.455 day
    lam3 = ref_lambda(4, 4, 3 * day)
    assert got["u3"]["interval_s"] == pytest.approx(1 / lam3, rel=1e-9)
    # single-visit priors
    assert got["u4"]["interval_s"] == 30 * day
    assert got["u5"]["interval_s"] == 3600.0
    # next_fetch anchors at the LAST visit
    assert got["u2"]["next_fetch_ts"].timestamp() == pytest.approx(
        _ts(3 * day).timestamp() + 30 * day
    )


def test_clamping(spark):
    day = 86400
    rows = [("hot", i * 60, True) for i in range(10)]  # changes every minute
    got = revisit_schedule(
        _hist(spark, rows), min_interval_s=3600.0, max_interval_s=30 * day
    ).first()
    assert got["interval_s"] == 3600.0  # clamped up to min_interval


def test_due_now(spark):
    day = 86400
    rows = [("a", 0, True), ("a", day, True), ("b", 0, False), ("b", day, False)]
    sched = revisit_schedule(
        _hist(spark, rows), min_interval_s=60.0, max_interval_s=30 * day
    )
    # 'a' changes daily → due within ~a day; 'b' never → due in 30 days
    due = due_now(sched, _ts(3 * day))
    assert [r["url"] for r in due.collect()] == ["a"]


def test_single_exchange_partial_agg(spark):
    rows = [("a", 0, True), ("a", 60, False)]
    plan = (
        revisit_schedule(_hist(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan.lower() or "HashAggregate" in plan


def test_observations_from_fetch(spark):
    fetched = spark.createDataFrame(
        [
            ("u1", _ts(0), True, False, "body-v1"),
            ("u2", _ts(0), True, True, None),  # 304
            ("u3", _ts(0), False, False, None),  # failed — no observation
            ("u4", _ts(0), True, False, "same"),
            ("u5", _ts(0), True, False, "new content"),
        ],
        "url string, fetch_ts timestamp, success boolean, "
        "not_modified boolean, body string",
    )
    prior = spark.createDataFrame(
        [("u4", "same"), ("u5", "old content")], "url string, body string"
    ).select("url", F.xxhash64("body").alias("fingerprint"))
    obs = {
        r["url"]: r["changed"]
        for r in observations_from_fetch(fetched, prior).collect()
    }
    assert obs == {
        "u1": True,  # no prior fingerprint → changed
        "u2": False,  # 304
        "u4": False,  # fingerprint match
        "u5": True,  # fingerprint differs
    }
