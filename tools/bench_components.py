"""Connected-components scale bench (q54's operator at 10^6-10^7 edges).

Synthesizes a dedup-shaped graph: mostly small chains (near-dup
clusters are small), a few long-range merge edges, and one large hub
cluster (a template page duplicated everywhere — the skew case).
Reports wall time, iterations-to-convergence, and edges/sec.

    python tools/bench_components.py [n_nodes] [cores] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.components import connected_components  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("bench_components", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(n_nodes)
    # chains: node -> node+1 for 30% of nodes (clusters of <= 4)
    chains = ids.filter((F.col("id") % 10 < 3) & (F.col("id") + 1 < n_nodes)).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    # sparse long-range merges
    merges = ids.filter((F.col("id") % 9973 == 0) & (F.col("id") + 5000 < n_nodes)).select(
        F.col("id").alias("src"), (F.col("id") + 5000).alias("dst")
    )
    # hub: 0.1% of nodes all connect to node 1 (template-page skew)
    hub = ids.filter(F.col("id") % 1000 == 7).select(
        F.col("id").alias("src"), F.lit(1).alias("dst")
    )
    edges = chains.union(merges).union(hub).persist()
    n_edges = edges.count()

    out = {
        "metric": "connected_components_edges_per_sec",
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "cores": cores,
    }
    # r4: map-side union-find pre-contraction vs the plain global loop
    for mode, pre in (("pre_contract", True), ("plain", False)):
        best = None
        for _ in range(trials):
            t0 = time.time()
            comp = connected_components(edges, pre_contract=pre)
            n_comp = comp.select("comp").distinct().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out["n_components"] = n_comp
        out[f"best_sec_{mode}"] = round(best, 2)
        out[f"edges_per_sec_{mode}"] = round(n_edges / best, 1)
    out["speedup"] = round(out["best_sec_plain"] / out["best_sec_pre_contract"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
