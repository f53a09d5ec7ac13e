#!/usr/bin/env python
"""Image payload decode/validate throughput + N-vs-4N scaling.

The graft cell's payload stage: a corpus of encoded images (binary
column, fmt rotation across ppm/bmp/png/qjpg and the REAL baseline
JPEG) is decoded and validated by the engine kernel
(``decode_stats_batch`` inside ``mapInPandas`` — Arrow batches, no
per-row Python at the Spark boundary). Reports images/s and MB/s.

Corpus build (synth + encode) is untimed — it stands in for the fetch
stage; the measured span is decode → stats → invariant aggregation,
exactly the per-row work the input_hint's PSNR/phash invariant costs
at scale.

Each parallelism level runs in its own subprocess (a session's master
can't change after getOrCreate). A perfectly-parallel JVM hash kernel
is timed alongside as the machine ceiling (virtualized clocks never
give raw 4x from N to 4N threads — see BENCH.md §1).

Usage:
  python tools/bench_images.py                    # orchestrate 8 vs 32
  python tools/bench_images.py --cores 8 --n 20000 --trials 3
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FMTS = ["ppm", "bmp", "png", "qjpg", "jpg"]
SIDE = 64  # every image SIDE x SIDE x 3


def run_one(cores: int, n: int, trials: int) -> dict:
    from pyspark.sql import functions as F

    from crawler_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(f"bench_images_{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))

    import numpy as np
    import pandas as pd

    from crawler_spark.functions.images import decode_stats_batch, encode_image

    def synth(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                fmt = FMTS[i % len(FMTS)]
                yy, xx = np.mgrid[0:SIDE, 0:SIDE]
                arr = np.stack(
                    [
                        (i * 7 + yy * 3 + xx * 5) % 256,
                        (i * 11 + yy * 2 + xx * 7) % 256,
                        (i * 13 + yy * 5 + xx * 2) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                rows.append((i, encode_image(arr, fmt), fmt))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

    corpus = (
        spark.range(n)
        .repartition(max(cores * 2, 16))
        .mapInPandas(synth, "image_id long, bytes binary, fmt string")
        .cache()
    )
    total_bytes = corpus.select(
        F.sum(F.length("bytes")).alias("b")
    ).collect()[0]["b"]  # materializes the cache (untimed corpus build)

    def validate(batches):
        for pdf in batches:
            stats = decode_stats_batch(pdf["bytes"], pdf["fmt"])
            stats["image_id"] = pdf["image_id"].values
            yield stats[["image_id", "ok", "dec_w", "dec_h", "dec_phash"]]

    def timed() -> float:
        t0 = time.perf_counter()
        row = (
            corpus.mapInPandas(
                validate,
                "image_id long, ok boolean, dec_w int, dec_h int, dec_phash long",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("ok").cast("long")).alias("n_ok"),
                F.bit_xor("dec_phash").alias("hash_xor"),
            )
            .collect()[0]
        )
        sec = time.perf_counter() - t0
        assert row["n"] == n and row["n_ok"] == n, (row["n"], row["n_ok"])
        return sec

    timed()  # warm-up: python worker pool + codegen
    best = min(timed() for _ in range(trials))

    # machine ceiling kernel (same-run, same cores). Warm up first —
    # whole-stage codegen compile would otherwise dominate the span —
    # and size the kernel so per-core work is seconds, not millis.
    spark.range(50_000_000).select(F.expr("bit_xor(xxhash64(id))")).collect()
    n_kernel = 4_000_000_000
    t0 = time.perf_counter()
    spark.range(n_kernel).select(F.expr("bit_xor(xxhash64(id))")).collect()
    ceiling_sec = time.perf_counter() - t0

    return {
        "cores": cores,
        "n_images": n,
        "corpus_mb": round(total_bytes / 1e6, 1),
        "sec": round(best, 3),
        "images_per_sec": round(n / best, 1),
        "mb_per_sec": round(total_bytes / 1e6 / best, 1),
        "ceiling_rows_per_sec": round(n_kernel / ceiling_sec, 1),
    }


def orchestrate(n: int, trials: int, levels: tuple[int, int] = (8, 32)) -> None:
    results = {}
    for cores in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cores", str(cores), "--n", str(n), "--trials", str(trials)],
            capture_output=True, text=True, check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    lo, hi = levels
    speedup = results[hi]["images_per_sec"] / results[lo]["images_per_sec"]
    ceiling = (
        results[hi]["ceiling_rows_per_sec"] / results[lo]["ceiling_rows_per_sec"]
    )
    print(json.dumps({
        "levels": results,
        "speedup": round(speedup, 3),
        "raw_efficiency_vs_4x": round(speedup / (hi / lo), 3),
        "machine_ceiling_speedup": round(ceiling, 3),
        "scaling_efficiency_vs_ceiling": round(speedup / ceiling, 3),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run_one(args.cores, args.n, args.trials)))
    else:
        orchestrate(args.n, args.trials)


if __name__ == "__main__":
    main()
