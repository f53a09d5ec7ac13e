#!/usr/bin/env python
"""pHash banded near-dup: the tier table, measured.

The pigeonhole guarantee (n_bands > max_hamming) fixes the band width,
and band width fixes the candidate economics on random-ish hashes:
expected candidates ~= n^2/2 * n_bands / 2^width. This tool measures
the three tiers at the largest n each sustains locally, with planted
twins to verify 100% recall at every point:

    max_hamming<=1 (2x32-bit bands) at n=10^7
    max_hamming<=3 (4x16-bit bands) at n=10^6
    max_hamming<=7 (8x8-bit bands)  at n=10^5

Hashes are synthesized JVM-side (xxhash64 longs); every 50th id gets a
twin perturbed in <= max_hamming bit positions. Recall = planted twins
found / planted. Usage: python tools/bench_phash.py [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from crawler_spark.operators.images_pipeline import near_duplicate_images
    from crawler_spark.session import get_spark

    spark = get_spark("bench_phash", cores=cores, shuffle_partitions=cores * 2)

    TWIN_EVERY = 50
    TWIN_OFF = 1 << 40  # twin id = id + TWIN_OFF (ids stay < TWIN_OFF)

    def build(n: int, k_bits: int):
        base = spark.range(n).select(
            F.col("id").alias("image_id"), F.xxhash64("id").alias("phash")
        )
        # twin = base hash with exactly k_bits distinct low-entropy
        # bit flips (positions derived from id, guaranteed distinct)
        mask = None
        for j in range(k_bits):
            bit = F.expr(f"shiftleft(1L, cast((id * {7 + 6 * j}) % 61 + {j} as int))")
            mask = bit if mask is None else mask.bitwiseOR(bit)
        twins = (
            spark.range(0, n, TWIN_EVERY)
            .select(
                (F.col("id") + TWIN_OFF).alias("image_id"),
                F.xxhash64("id").bitwiseXOR(mask).alias("phash"),
            )
        )
        return base.unionByName(twins)

    results = []
    for max_h, n, k_bits in ((1, 10_000_000, 1), (3, 1_000_000, 3), (7, 100_000, 3)):
        imgs = build(n, k_bits).cache()
        n_rows = imgs.count()  # materialize (untimed)
        t0 = time.perf_counter()
        pairs = near_duplicate_images(imgs, max_hamming=max_h)
        agg = pairs.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(
                ((F.col("id_b") - F.col("id_a")) == TWIN_OFF).cast("long")
            ).alias("planted_found"),
        ).collect()[0]
        sec = time.perf_counter() - t0
        planted = n // TWIN_EVERY
        results.append(
            {
                "max_hamming": max_h,
                "n_hashes": n_rows,
                "pairs": int(agg["pairs"]),
                "planted": planted,
                "recall": round(int(agg["planted_found"]) / planted, 4),
                "sec": round(sec, 2),
                "hashes_per_sec": round(n_rows / sec, 1),
            }
        )
        imgs.unpersist()
        assert results[-1]["recall"] == 1.0, results[-1]
    print(json.dumps({"cores": cores, "tiers": results}))


if __name__ == "__main__":
    main()
