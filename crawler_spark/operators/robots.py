"""Robots filter (north rule; absent in the reference — verified, no
robots/delay/throttle logic anywhere in ``src/``, SURVEY §2.10).

Rules table: (host, path_prefix, allow). Decision = longest matching
prefix wins; no match ⇒ allow. Implemented as a broadcast join +
startswith theta condition + max-prefix-length window — all built-ins.
At 10^10-URL scale the rules table stays small (rules per host, not per
URL), so broadcast is the right physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.canonical import host_col


def with_path(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "_path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )


def robots_filter(
    candidates: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_column: str | None = "host",
) -> DataFrame:
    """Keep only robots-allowed rows. Adds nothing; drops `_path`."""
    df = with_path(candidates, url_col)
    if host_column is None:
        df = df.withColumn("_host", host_col(F.col(url_col)))
        host_column = "_host"
    r = F.broadcast(
        robots.select(
            F.col("host").alias("_r_host"),
            F.col("path_prefix").alias("_r_prefix"),
            F.col("allow").alias("_r_allow"),
        )
    )
    joined = df.join(
        r,
        (F.col(host_column) == F.col("_r_host"))
        & F.col("_path").startswith(F.col("_r_prefix")),
        "left",
    )
    w = Window.partitionBy(*df.columns).orderBy(
        F.length(F.col("_r_prefix")).desc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.coalesce(F.col("_r_allow"), F.lit(True)))
        .drop("_r_host", "_r_prefix", "_r_allow", "_rn", "_path", "_host")
    )
