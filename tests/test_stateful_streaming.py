"""applyInPandasWithState operators: cross-micro-batch state.

Harness: a file-source stream (parquet dir); batch 2 is written after
the first processAllAvailable, so its rows arrive in a LATER
micro-batch and the assertions genuinely exercise state carry-over."""

from __future__ import annotations

import os

import pytest

from crawler_spark.streaming.stateful import (
    streaming_first_seen,
    streaming_sessionize,
)


def _run_two_batches(spark, tmp_path, name, schema, batch1, batch2, op):
    src = str(tmp_path / f"{name}_src")
    ckpt = str(tmp_path / f"{name}_ckpt")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        mid = [tuple(r) for r in spark.sql(f"select * from {name}").collect()]
        spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        end = [tuple(r) for r in spark.sql(f"select * from {name}").collect()]
    finally:
        q.stop()
    return mid, end


def test_streaming_first_seen_across_batches(spark, tmp_path):
    schema = "url_key long, url string"
    b1 = [(1, "u1"), (2, "u2"), (2, "u2dup"), (3, "u3")]
    b2 = [(2, "u2again"), (4, "u4"), (1, "u1again"), (5, "u5"), (5, "u5dup")]
    mid, end = _run_two_batches(
        spark, tmp_path, "firstseen", schema, b1, b2, streaming_first_seen
    )
    assert sorted(k for k, _ in mid) == [1, 2, 3]
    # batch 2: keys 1, 2 are in bloom STATE from batch 1 → dropped;
    # in-batch dup of 5 dropped; only 4 and 5 emit
    assert sorted(k for k, _ in end) == [1, 2, 3, 4, 5]
    new = {k: u for k, u in end}
    assert new[4] == "u4" and new[5] == "u5"
    assert new[2] == "u2"  # the batch-1 row, not u2again


def test_streaming_sessionize_state_carry(spark, tmp_path):
    schema = "user_id string, ts long"
    b1 = [("a", 1000), ("a", 1100), ("b", 1000)]
    # a@1200 continues session 1 (gap 100 ≤ 1800); a@9000 starts
    # session 2 (gap 7800 > 1800); b@99000 starts b's session 2
    b2 = [("a", 1200), ("a", 9000), ("b", 99000)]
    mid, end = _run_two_batches(
        spark,
        tmp_path,
        "sess",
        schema,
        b1,
        b2,
        lambda s: streaming_sessionize(s, gap_s=1800),
    )
    assert sorted(mid) == [("a", 1000, "a#1"), ("a", 1100, "a#1"), ("b", 1000, "b#1")]
    got2 = sorted(set(end) - set(mid))
    assert got2 == [("a", 1200, "a#1"), ("a", 9000, "a#2"), ("b", 99000, "b#2")]


def test_first_seen_parity_with_batch_dedup(spark, tmp_path):
    """Streamed first-seen over two batches equals a batch first-wins
    dedup over the concatenation (bloom fpp negligible at this size)."""
    import random

    rng = random.Random(3)
    rows = [(rng.randrange(500), f"u{i}") for i in range(600)]
    b1, b2 = rows[:300], rows[300:]
    schema = "url_key long, url string"
    _, end = _run_two_batches(
        spark, tmp_path, "paritydedup", schema, b1, b2, streaming_first_seen
    )
    first = {}
    for k, u in rows:
        first.setdefault(k, u)
    assert sorted(end) == sorted((k, u) for k, u in first.items())


def test_sessionize_sorts_across_arrow_chunks(spark, tmp_path):
    """ADVICE r2: the group iterator yields Arrow chunks in arrival
    order; sorting per chunk assigned wrong session ids when one user's
    batch spanned chunks with interleaved timestamps. Force 2-row
    chunks and feed out-of-order events — the operator must sort the
    WHOLE group once."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        schema = "user_id string, ts long"
        b1 = [("a", 5000), ("a", 1000), ("a", 5100), ("a", 1100), ("a", 9000)]
        b2 = [("a", 9100)]
        _, end = _run_two_batches(
            spark,
            tmp_path,
            "sesschunk",
            schema,
            b1,
            b2,
            lambda s: streaming_sessionize(s, gap_s=1800),
        )
    finally:
        spark.conf.set(key, old)
    got = sorted(end)
    assert got == [
        ("a", 1000, "a#1"),
        ("a", 1100, "a#1"),
        ("a", 5000, "a#2"),
        ("a", 5100, "a#2"),
        ("a", 9000, "a#3"),
        ("a", 9100, "a#3"),
    ]
