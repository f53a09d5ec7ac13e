#!/usr/bin/env python
"""ShardedBloom at scale: insert 10M url keys, probe 2.5M unseen
candidates, report throughput + observed false-positive rate vs the
sizing math (9.6 bits/key @ k=7 → ~1% fpp). This is the D3a tier the
10^10 frontier depends on: at 10^10 keys the same layout is ~1.2 GB
per 10^9 keys sharded by pmod(key, P) — update/probe stay one
co-partitioned shuffle regardless of P.

Usage: python tools/bench_bloom.py [n_keys] [n_shards]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.operators.dedup import ShardedBloom
from crawler_spark.plans.store import SnapshotStore
from crawler_spark.session import get_spark


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("bloom_bench")

    # size for ~9.6 bits/key (1% fpp at k=7), rounded up to byte-aligned
    bits_per_shard = ((int(n_keys * 9.6) // n_shards + 7) // 8) * 8
    import tempfile

    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="bloom_bench_"))
    bloom = ShardedBloom(
        spark, store, n_shards=n_shards, bits_per_shard=bits_per_shard, n_hashes=7
    )

    keys = spark.range(n_keys).select(F.xxhash64("id").alias("url_key"))
    t0 = time.perf_counter()
    bloom.update(keys)
    t_update = time.perf_counter() - t0

    # candidates disjoint from inserted keys (different hash seed space)
    n_cand = n_keys // 4
    cands = spark.range(n_keys, n_keys + n_cand).select(
        F.xxhash64("id").alias("url_key")
    )
    t0 = time.perf_counter()
    probed = bloom.probe(cands)
    n_maybe = probed.filter(F.col("maybe_seen")).count()
    t_probe = time.perf_counter() - t0

    fpp = n_maybe / n_cand
    print(
        {
            "n_keys": n_keys,
            "n_shards": n_shards,
            "bits_per_key": round(bits_per_shard * n_shards / n_keys, 2),
            "mb_total": round(bits_per_shard * n_shards / 8 / 1e6, 1),
            "update_sec": round(t_update, 2),
            "update_keys_per_sec": round(n_keys / t_update, 0),
            "probe_sec": round(t_probe, 2),
            "probe_keys_per_sec": round(n_cand / t_probe, 0),
            "observed_fpp": round(fpp, 5),
            "expected_fpp": 0.01,
        }
    )
    assert fpp < 0.02, f"fpp {fpp} out of spec"

    # correctness at scale: every inserted key must report maybe_seen
    sample = keys.sample(0.001, seed=1)
    n_sample = sample.count()
    hits = bloom.probe(sample).filter(F.col("maybe_seen")).count()
    assert hits == n_sample, f"false negatives: {n_sample - hits}"
    print({"no_false_negatives_on_sample": n_sample})


if __name__ == "__main__":
    main()
