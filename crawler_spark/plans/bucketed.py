"""Host-bucketed frontier storage — the zero-shuffle politeness path.

The north rule stores the frontier "hash-partitioned by host to
enforce politeness". The constant-rank trick in
``operators/politeness.py`` already bounds the politeness exchange to
O(hosts × cap) rows; THIS module removes the exchange entirely: a
frontier written with ``bucketBy(N, "host")`` is read back with
``HashPartitioning(host, N)`` as the scan's output partitioning, which
satisfies the window's ClusteredDistribution(host) requirement — so
``select_round`` plans as Scan → Sort → WindowGroupLimit → Window with
NO Exchange at all (plan-gated in tests/test_bucketed.py).

At 10^10 rows this matters twice per round: the politeness window AND
the host-keyed fetch grouping both co-locate for free, every round,
for the one-time cost of bucketing at write. Bucket count is a layout
property (choose ~2-4× executor count); politeness results are
byte-identical to the unbucketed path (same-output test).

Spark specifics: bucketing rides the session catalog (``saveAsTable``;
V1 parquet bucketing), so the table name, not a path, is the handle.
``spark.sql.sources.bucketing.enabled`` is on by default. Reading by
path loses bucket metadata — always read back via ``spark.table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_frontier(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist a frontier snapshot host-bucketed (+ sorted within
    buckets by the politeness priority prefix, so the window's Sort is
    cheap and file-local)."""
    (
        df.write.bucketBy(buckets, "host")
        .sortBy("host")
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_frontier(spark: SparkSession, table: str) -> DataFrame:
    """Read back WITH bucket metadata (path reads would drop it)."""
    return spark.table(table)
