"""Connected components over a pair list — duplicate-cluster
canonicalization.

Near-dup pipelines (MinHash-LSH q22/q48, pHash q47, embedding q38)
emit PAIRS; turning pairs into clusters and electing one canonical
document per cluster is a transitive closure — document A~B and B~C
must collapse into one cluster even though (A, C) was never a
candidate pair. The reference has no analog (its dedup is exact
URL-seen); this is the graft's scale path for "keep one copy of each
near-dup cluster" over 100 TB.

Algorithm: min-label propagation with POINTER JUMPING —

  1. every node starts as its own component (label = node id);
  2. each iteration, a node takes the min label among itself and its
     neighbors (one shuffle keyed by node);
  3. then labels chase their own label's label (``comp := comp[comp]``,
     one shuffle keyed by label) — path halving, which turns the
     O(diameter) convergence of plain propagation into ~O(log d);
  4. stop when an iteration changes nothing.

Spark-specific care, both required for iterative jobs:

  * ``localCheckpoint(eager=True)`` every iteration cuts the lineage
    chain — without it the plan doubles per iteration and the driver
    eventually stalls in the optimizer (classic iterative-Spark trap);
  * the convergence check is ONE scalar ``count()`` per iteration
    (driver action), the same O(rounds) driver cost any fixed-point
    loop pays; clusters from banded candidate generation have small
    diameter, so rounds ≈ 3-5 in practice.

At cluster scale each iteration is two hash-shuffles of the
(node, comp) table; there is no all-pairs stage and no driver-side
collection of the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the MIN node id reachable from the node
    (undirected). Raises if ``max_iter`` iterations don't converge —
    a real 100 TB run should fail loudly, not return a half-merged
    clustering."""
    e = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .union(
            edges.select(
                F.col(dst).cast("long").alias("src"), F.col(src).cast("long").alias("dst")
            )
        )
        .distinct()
    )
    e = e.localCheckpoint(eager=False)
    comp = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            e.join(comp.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = comp.join(nbr, "node", "left").select(
            "node",
            F.col("comp").alias("prev"),
            F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"),
        )
        # pointer jumping: comp := comp[comp] (labels are node ids, so
        # the label table doubles as the parent table)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        jumped = (
            stepped.join(parent, stepped["comp"] == parent["p_node"], "left")
            .select(
                "node",
                "prev",
                F.least("comp", F.coalesce("p_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("comp") != F.col("prev")).count()
        comp = jumped.select("node", "comp")
        if changed == 0:
            return comp
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} iterations "
        "(graph diameter too large for the iteration budget — raise max_iter)"
    )


def duplicate_clusters(
    pairs: DataFrame, left: str = "a", right: str = "b", max_iter: int = 30
) -> DataFrame:
    """Near-dup pairs → (doc_id, component, cluster_size,
    is_canonical): the keep/drop decision table for a dedup sweep.
    ``is_canonical`` marks the minimum doc id of each cluster — the
    copy a 100 TB sweep retains. Only documents appearing in at least
    one pair are returned (singletons are trivially canonical)."""
    comp = connected_components(pairs, src=left, dst=right, max_iter=max_iter)
    sizes = comp.groupBy("comp").agg(F.count("*").cast("long").alias("cluster_size"))
    return comp.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("component"),
        "cluster_size",
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )
