"""Deterministic weighted data mixing (operators/mixing.py).

Selection is a pure md5 hash of the row key — so the same corpus,
weights, and seed yield the SAME sample on any partitioning, any
cluster size, any run (no RNG state). Upsampling emits whole epochs
plus a fractional Bernoulli remainder; temperature weights follow the
published p_i ∝ c_i^(1/τ) formulation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.mixing import (
    mix_corpus,
    temperature_weights,
    weighted_sample,
)


def _corpus(spark, n=6000, parts=4):
    return (
        spark.range(n, numPartitions=parts)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "domain", F.concat(F.lit("d"), (F.col("doc_id") % 3).cast("string"))
        )
    )


def test_rates_and_epochs(spark):
    df = _corpus(spark)
    out = weighted_sample(
        df, "domain", "doc_id", {"d0": 0.25, "d1": 1.0, "d2": 2.5}, seed=1
    )
    per = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    # 2000 rows/domain; hash-Bernoulli binomial: ±5σ ≈ ±97 for p=.25
    assert abs(per["d0"] - 2000 * 0.25) < 120
    assert per["d1"] == 2000  # w=1.0: every row exactly once
    assert abs(per["d2"] - 2000 * 2.5) < 120
    # upsampled rows appear 2 or 3 times with epochs 1..n
    eps = (
        out.filter(F.col("domain") == "d2")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list("epoch")).alias("e"))
        .collect()
    )
    for r in eps:
        assert r["n"] in (2, 3)
        assert r["e"] == list(range(1, r["n"] + 1))


def test_deterministic_across_partitioning(spark):
    df = _corpus(spark, n=2000, parts=2)
    w = {"d0": 0.5, "d1": 0.5, "d2": 0.5}
    a = weighted_sample(df, "domain", "doc_id", w, seed=7)
    b = weighted_sample(df.repartition(16, "domain"), "domain", "doc_id", w, seed=7)
    sa = {(r["doc_id"], r["epoch"]) for r in a.collect()}
    sb = {(r["doc_id"], r["epoch"]) for r in b.collect()}
    assert sa == sb and len(sa) > 0
    # a different seed selects a different (overlapping) set
    sc = {
        (r["doc_id"], r["epoch"])
        for r in weighted_sample(df, "domain", "doc_id", w, seed=8).collect()
    }
    assert sc != sa


def test_unlisted_domain_dropped_and_validation(spark):
    df = _corpus(spark, n=300)
    out = weighted_sample(df, "domain", "doc_id", {"d0": 1.0}, seed=0)
    assert {r["domain"] for r in out.select("domain").distinct().collect()} == {"d0"}
    with pytest.raises(ValueError):
        weighted_sample(df, "domain", "doc_id", {})
    with pytest.raises(ValueError):
        weighted_sample(df, "domain", "doc_id", {"d0": -0.1})


def test_temperature_weights_formulation():
    counts = {"big": 90000, "small": 10000}
    # τ=1: natural proportions → every domain sampled at the same rate
    w1 = temperature_weights(counts, 1.0, target_rows=10000)
    assert math.isclose(w1["big"], w1["small"])
    assert math.isclose(w1["big"], 0.1)
    # τ large: near-uniform across domains → small domain upsampled
    w8 = temperature_weights(counts, 100.0, target_rows=10000)
    assert w8["small"] > w1["small"] and w8["big"] < w1["big"]
    assert w8["small"] / w8["big"] > 5  # ≈ 9 at τ→∞
    # expected output size is the target under both
    for w in (w1, w8):
        assert math.isclose(
            sum(w[d] * c for d, c in counts.items()), 10000, rel_tol=1e-9
        )
    with pytest.raises(ValueError):
        temperature_weights(counts, 0.0, 1)


def test_mix_corpus_hits_target(spark):
    df = _corpus(spark, n=9000)  # 3 domains × 3000
    out = mix_corpus(df, "domain", "doc_id", temperature=2.0, target_rows=4000)
    n = out.count()
    assert abs(n - 4000) < 300  # binomial noise around the expectation


def test_map_only_plan(spark):
    """The sampling stage itself adds no shuffle: filter + explode on
    top of the scan (the one Exchange allowed is the input's own)."""
    df = _corpus(spark, n=100, parts=2)
    out = weighted_sample(df, "domain", "doc_id", {"d0": 1.5, "d1": 0.5, "d2": 1.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_deterministic_shuffle_order(spark):
    from crawler_spark.operators.mixing import deterministic_shuffle

    df = _corpus(spark, n=500, parts=3)
    a = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=3).collect()]
    b = [
        r["doc_id"]
        for r in deterministic_shuffle(df.repartition(11), "doc_id", seed=3).collect()
    ]
    assert a == b and a != sorted(a)  # same order, and it's shuffled
    c = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=4).collect()]
    assert c != a and sorted(c) == sorted(a)
