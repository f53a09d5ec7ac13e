"""Join operators Spark lacks as built-ins (SURVEY §2.5 'not present in
the reference' family, provided as graft extensions for the training-data
pipeline).

  * :func:`asof_join` — point-in-time join without range explosion:
    union both sides, one shuffle+sort per key, forward-fill the last
    right-side payload with a running ``last(ignorenulls)`` window.
    Cost is O((|L|+|R|) log) per key partition — no |L|×|R| blowup, no
    broadcast requirement, skew bounded by the hottest key (salt the
    key upstream if a single entity dominates).

  * :func:`range_join_bucketed` — interval join (|ts_a − ts_b| ≤ width)
    via time-bucketing: each left row explodes into the (at most two)
    buckets its window overlaps, the join is then an equi-join on
    (key, bucket) with the exact range predicate as a residual filter.
    Turns a theta-join (nested-loop at scale) into a shuffle hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same key(s) (<= semantics: a right
    row at exactly left_ts matches).

    ``tiebreak``: right-side column ordering equal-timestamp right rows
    (the greatest wins) — required for a deterministic result when
    right timestamps can collide. Right's non-key columns come back
    suffixed; unmatched left rows get nulls (left-outer as-of).
    """
    rcols = [c for c in right.columns if c not in on]
    payload = F.struct(
        *[F.col(c).alias(c + suffix) for c in rcols]
    ).alias("_payload")
    r = right.select(*on, F.col(right_ts).alias("_ts"), payload).withColumn(
        "_side", F.lit(0)
    )
    if tiebreak is not None:
        r = r.withColumn("_tb", F.col("_payload")[tiebreak + suffix])
    else:
        r = r.withColumn("_tb", F.lit(0))
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_payload", "_ts", "_side", "_tb")
    for c in rcols:
        out = out.withColumn(c + suffix, F.col("_m")[c + suffix])
    return out.drop("_m")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts_a",
    right_ts: str = "ts_b",
    width_s: int = 300,
) -> DataFrame:
    """Pairs with ``0 < ts_b − ts_a ≤ width_s`` per key, as an equi-join
    on (key, time bucket) + residual predicate. Left rows replicate into
    the two buckets their forward window can touch; right rows land in
    their own bucket — replication factor is exactly 2, independent of
    data volume.
    """
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.array(
                (F.unix_timestamp(F.col(left_ts)) / width_s).cast("long"),
                (F.unix_timestamp(F.col(left_ts)) / width_s).cast("long") + 1,
            )
        ),
    )
    rb = right.withColumn(
        "_bucket", (F.unix_timestamp(F.col(right_ts)) / width_s).cast("long")
    )
    cond = (
        (F.col(right_ts) > F.col(left_ts))
        & (F.unix_timestamp(F.col(right_ts)) - F.unix_timestamp(F.col(left_ts)) <= width_s)
    )
    return lb.join(rb, on=[*on, "_bucket"]).filter(cond).drop("_bucket")
