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


def _contract_partitions(e: DataFrame) -> DataFrame:
    """One map-side union-find pass over each partition's edges
    (VERDICT r3 #4 — the standard large-graph pre-contraction): every
    partition collapses the edges it holds and emits one
    (node → local min-root) mapping row per node it saw. All local
    structure disappears into the mapping; the only global work left
    is stitching nodes that appear in MULTIPLE partitions with
    different local roots (boundary nodes), which the caller derives
    from the mapping itself. Input partitioning is kept as-is:
    near-dup pair streams arrive cluster-clumped (banded-join
    output), and a hash repartition would both cost a shuffle and
    destroy that locality. Memory is O(nodes per partition) in a
    plain dict — the same sizing constraint the global loop's shuffle
    already imposes."""
    import pandas as pd

    def contract(batches):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        seen: set[int] = set()
        for pdf in batches:
            for u, v in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
                u, v = int(u), int(v)
                seen.add(u)
                seen.add(v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union by MIN id: local roots are local min labels
                    if ru < rv:
                        parent[rv] = ru
                    else:
                        parent[ru] = rv
        nodes = list(seen)
        yield pd.DataFrame(
            {"node": nodes, "root": [find(n) for n in nodes]}, dtype="int64"
        )

    return e.mapInPandas(contract, "node long, root long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    pre_contract: bool = True,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the MIN node id reachable from the node
    (undirected). Raises if ``max_iter`` iterations don't converge —
    a real 100 TB run should fail loudly, not return a half-merged
    clustering."""
    e0 = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    if not pre_contract:
        return _cc_loop(e0, max_iter)
    mapping = _contract_partitions(e0).localCheckpoint(eager=True)
    # residue graph: a node seen by several partitions with different
    # local roots stitches those roots together — star edges to the
    # node's min root. Everything else is already contracted away, so
    # the iterative loop runs over boundary structure only.
    rmin = mapping.groupBy("node").agg(F.min("root").alias("rmin"))
    residue = (
        mapping.join(rmin, "node")
        .filter(F.col("root") != F.col("rmin"))
        .select(F.col("root").alias("src"), F.col("rmin").alias("dst"))
        .distinct()
    )
    core = _cc_loop(residue, max_iter)
    # local roots are local min labels, so the min root of a component
    # IS its min node (any smaller node would be its partition's root);
    # roots outside the residue keep their own label via coalesce. The
    # mapping is touched once here and once at checkpoint — never per
    # iteration.
    return (
        mapping.join(
            core.select(F.col("node").alias("root"), "comp"), "root", "left"
        )
        .groupBy("node")
        .agg(F.min(F.coalesce("comp", "root")).alias("comp"))
    )


def _cc_loop(e0: DataFrame, max_iter: int) -> DataFrame:
    """Min-label propagation + pointer jumping over a (src, dst) edge
    list (see module docstring)."""
    e = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
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
