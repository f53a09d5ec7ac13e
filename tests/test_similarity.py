"""Tunable MinHash+LSH operator: recall at production parameters.

Synthetic corpus with controlled overlap: near-dup pairs (2 of 50
words changed, Jaccard ≈ 0.88 on 3-gram shingles), mid pairs (half
rewritten), and unrelated documents. With (k=128, b=32, r=4) the
S-curve collision probability at s=0.88 is ≈ 1 - (1 - 0.88^4)^32 ≈
1 - 0.4^32 ≈ 1, so every near-dup pair MUST surface (deterministic
hashes make the test reproducible); unrelated pairs (s ≈ 0) must not
pass the estimate threshold. The signature estimate is checked against
exact Jaccard within the k=128 binomial tolerance."""

from __future__ import annotations

from crawler_spark.operators.similarity import (
    exact_jaccard_pairs,
    minhash_pairs,
    minhash_signatures,
)

import pytest


def _corpus(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for d in range(20):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(50)]
        rows.append((f"doc{d:02d}", " ".join(words)))
        near = list(words)
        near[10] = "xx"
        near[30] = "yy"
        rows.append((f"doc{d:02d}_near", " ".join(near)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_minhash_recall_and_estimate(spark):
    df = _corpus(spark)
    got = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_pairs(
            df, "doc_id", "text", k=128, bands=32, min_est_jaccard=0.5
        ).collect()
    }
    # every planted near-dup pair surfaces
    for d in range(20):
        pair = (f"doc{d:02d}", f"doc{d:02d}_near")
        assert pair in got, f"missing planted near-dup {pair}"
    # no unrelated pair sneaks past the estimate threshold
    for (a, b), est in got.items():
        assert b == a + "_near", f"unrelated pair above threshold: {(a, b, est)}"

    # estimate tracks exact jaccard within the binomial tolerance
    pairs = minhash_pairs(df, "doc_id", "text", k=128, bands=32, min_est_jaccard=0.5)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(df, "doc_id", "text", pairs).collect()
    }
    for pair, est in got.items():
        assert abs(est - exact[pair]) < 0.15, (pair, est, exact[pair])
        assert exact[pair] > 0.7  # planted pairs really are near-dups


def test_minhash_single_shuffle_plan(spark):
    df = _corpus(spark)
    sigs = minhash_signatures(df, "doc_id", "text", k=16)
    plan = sigs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Union" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # distinct + groupBy


def test_bands_must_divide_k(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError, match="must divide"):
        minhash_pairs(df, "doc_id", "text", k=100, bands=32)


def test_short_and_empty_docs_do_not_abort(spark):
    """ADVICE r2 (high): sequence(1, 0) is descending in Spark, so a
    doc with fewer words than the shingle width used to throw
    INVALID_PARAMETER_VALUE.START and abort the whole sweep. Short and
    empty docs must instead contribute zero shingles."""
    rows = [
        ("empty", ""),
        ("one", "hello"),
        ("two", "hello world"),
        ("ws", "   "),
        ("long", " ".join(f"w{i}" for i in range(50))),
        ("long_near", " ".join(("xx" if i == 10 else f"w{i}") for i in range(50))),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sigs = minhash_signatures(df, "doc_id", "text", k=8)
    # docs without shingles produce no signature row (nothing to hash)
    assert sorted(r["doc_id"] for r in sigs.collect()) == ["long", "long_near"]
    pairs = minhash_pairs(df, "doc_id", "text", k=8, bands=4, min_est_jaccard=0.5)
    got = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert got == [("long", "long_near")]


def test_queries_shingles_short_docs(spark):
    """Same latent crash in queries.py _shingles / q29 grams."""
    from crawler_spark.queries import _shingles

    rows = [("a", ""), ("b", "one two"), ("c", "one two three four")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = sorted(
        (r["doc_id"], r["shingle"]) for r in _shingles(df).collect()
    )
    assert got == [("c", "one two three"), ("c", "two three four")]


def test_exact_jaccard_keeps_empty_intersection_pairs(spark):
    """ADVICE r2: the verify tier must return a row for EVERY candidate
    pair — empty intersections score 0.0 instead of disappearing."""
    rows = [
        ("x", "a b c d e"),
        ("y", "a b c d e f"),
        ("z", "p q r s t"),
        ("w", ""),  # no shingles at all
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = spark.createDataFrame(
        [("x", "y"), ("x", "z"), ("x", "w"), ("w", "z")],
        "doc_a string, doc_b string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(df, "doc_id", "text", pairs).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("x", "w"), ("w", "z")}
    # x: {abc,bcd,cde}, y: {abc,bcd,cde,def} → 3 shared of 4 union
    assert got[("x", "y")] == pytest.approx(3 / 4)
    assert got[("x", "z")] == 0.0
    assert got[("x", "w")] == 0.0
    assert got[("w", "z")] == 0.0
