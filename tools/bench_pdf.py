"""S8 throughput micro-bench: PDF bytes → text at scale shape.

Synthesizes N PDFs (5 pages × 8 lines each; mode rotates across
plain / Flate / LZW-chained / RC4-128 / AES-128) as a binary column,
then drives the full pdf_text path (decrypt → filter decode →
tokenize → assemble) and reports docs/s and pages/s.

    python tools/bench_pdf.py [n_docs] [cores] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("bench_pdf")
        .getOrCreate()
    )
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.operators.pdf_decode import make_pdf, pdf_text

    pages = 5
    modes = [None, None, "rc4-128", None, "aes-128"]
    chains = [None, ["FlateDecode"], ["FlateDecode"], ["ASCII85Decode", "LZWDecode"], ["FlateDecode"]]

    @pandas_udf("binary")
    def _mk(ids):
        def mk(i):
            i = int(i)
            pg = [
                [(700.0 - 14 * ln, f"doc {i} page {p} line {ln} of the corpus")
                 for ln in range(8)]
                for p in range(pages)
            ]
            return make_pdf(pg, filters=chains[i % 5], encrypt=modes[i % 5])
        return ids.map(mk)

    docs = (
        spark.range(n_docs)
        .repartition(cores)
        .select(F.col("id").alias("doc_id"), _mk(F.col("id")).alias("data"))
        .persist()
    )
    docs.count()  # materialize the build outside the timed region

    best = None
    for _ in range(trials):
        t0 = time.time()
        out = pdf_text(docs, "data", "doc_id").count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        assert out == n_docs * pages, (out, n_docs * pages)

    print(json.dumps({
        "metric": "pdf_decode_docs_per_sec",
        "n_docs": n_docs,
        "pages_per_doc": pages,
        "cores": cores,
        "best_sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "pages_per_sec": round(n_docs * pages / best, 1),
    }))


if __name__ == "__main__":
    main()
