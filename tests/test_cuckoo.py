"""Sharded cuckoo filter: membership, deletion, fpp, and golden-crawl
equivalence as the approximate dedup tier."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.cuckoo import (
    ShardedCuckoo,
    _contains_batch,
    _delete_batch,
    _insert_batch,
)
from crawler_spark.plans.store import SnapshotStore


# ------------------------------------------------------------ kernel level


def test_kernel_membership_and_fpp():
    nb = 1 << 12
    table = np.zeros((nb, 4), np.uint16)
    rng = np.random.default_rng(1)
    keys = rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    _insert_batch(table, keys, rng_seed=1)
    assert _contains_batch(table, keys).all()  # no false negatives
    other = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    other = np.setdiff1d(other, keys)
    fpp = _contains_batch(table, other).mean()
    assert fpp < 0.005, fpp  # theory ≈ 2·4/2^16 ≈ 0.00012 at this load


def test_kernel_delete():
    nb = 1 << 10
    table = np.zeros((nb, 4), np.uint16)
    rng = np.random.default_rng(2)
    keys = rng.integers(-(2**62), 2**62, 2_000, dtype=np.int64)
    _insert_batch(table, keys, rng_seed=2)
    gone, kept = keys[:1000], keys[1000:]
    removed = _delete_batch(table, gone)
    assert removed == 1000
    assert _contains_batch(table, kept).all()  # survivors intact
    # deleted keys mostly gone (a few may collide with kept fingerprints)
    assert _contains_batch(table, gone).mean() < 0.01


def test_kernel_full_raises():
    table = np.zeros((4, 4), np.uint16)  # 16 slots
    keys = np.arange(100, dtype=np.int64)
    with pytest.raises(RuntimeError, match="full"):
        _insert_batch(table, keys, rng_seed=3)


def test_power_of_two_enforced(spark, tmp_path):
    with pytest.raises(ValueError, match="power of two"):
        ShardedCuckoo(spark, SnapshotStore(spark, str(tmp_path)), buckets_per_shard=1000)


# ------------------------------------------------------------- Spark level


def test_spark_update_probe_delete(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "ck"))
    ck = ShardedCuckoo(spark, store, n_shards=4, buckets_per_shard=1 << 12)
    keys = spark.range(5_000).select(F.xxhash64("id").alias("url_key"))
    ck.update(keys)
    probed = ck.probe(keys)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # no false negatives

    unseen = spark.range(5_000, 10_000).select(F.xxhash64("id").alias("url_key"))
    fp = ck.probe(unseen).filter(F.col("maybe_seen")).count()
    assert fp / 5_000 < 0.005

    # delete the first half and re-probe
    first = spark.range(2_500).select(F.xxhash64("id").alias("url_key"))
    rest = spark.range(2_500, 5_000).select(F.xxhash64("id").alias("url_key"))
    ck.delete(first)
    assert ck.probe(rest).filter(~F.col("maybe_seen")).count() == 0
    assert ck.probe(first).filter(F.col("maybe_seen")).count() / 2_500 < 0.01


def test_cuckoo_tier_golden_equivalence(
    spark, world, fixture_dir, tmp_path_factory, oracle_result
):
    from tests.test_crawl_parity import _engine_order, _oracle_order
    from crawler_spark.sources.fetch import FixtureFetcher
    from crawler_spark.sources.fixtures_io import read_table
    from crawler_spark.streaming.rounds import CrawlEngine

    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("engc") / "store"))
    eng = CrawlEngine(
        spark=spark,
        store=store,
        fetcher=FixtureFetcher(
            pages={u: (p.body, p.fail_rounds, p.latency_ms) for u, p in world.pages.items()}
        ),
        robots=read_table(spark, fixture_dir, "robots"),
        politeness=read_table(spark, fixture_dir, "politeness"),
        use_cuckoo=True,
    )
    eng.init_frontier(read_table(spark, fixture_dir, "seeds"))
    eng.run(max_rounds=50)
    assert _engine_order(eng) == _oracle_order(oracle_result)
    assert {r["url"] for r in eng.url_seen().collect()} == oracle_result.url_seen


def test_null_keys_do_not_crash_cogroup(spark, tmp_path):
    """ADVICE r1: a NULL key used to form a null-shard cogroup with no
    filter-side frame and raise IndexError inside the executor. Null
    keys are dropped at tagging (update/delete) and null-key candidates
    resolve conservatively through the exact tier (probe)."""
    store = SnapshotStore(spark, str(tmp_path / "cknull"))
    ck = ShardedCuckoo(spark, store, n_shards=4, buckets_per_shard=1 << 12)
    keys = spark.createDataFrame(
        [(1,), (2,), (None,)], "url_key long"
    )
    ck.update(keys)  # must not raise
    probed = ck.probe(keys)
    rows = {r["url_key"]: r["maybe_seen"] for r in probed.collect()}
    assert rows[1] and rows[2]
    ck.delete(spark.createDataFrame([(None,), (1,)], "url_key long"))
    assert ck.probe(spark.createDataFrame([(2,)], "url_key long")).first()["maybe_seen"]


def test_bloom_null_keys_do_not_crash(spark, tmp_path):
    from crawler_spark.operators.dedup import ShardedBloom

    store = SnapshotStore(spark, str(tmp_path / "blnull"))
    bl = ShardedBloom(spark, store, n_shards=4)
    keys = spark.createDataFrame([(7,), (None,)], "url_key long")
    bl.update(keys)  # must not raise
    assert bl.probe(spark.createDataFrame([(7,)], "url_key long")).first()["maybe_seen"]
