"""Robots filter (north rule; absent in the reference — verified, no
robots/delay/throttle logic anywhere in ``src/``, SURVEY §2.10).

Rules table: (host, path_prefix, allow). Decision per RFC 9309:
most-specific rule wins (longest rule string); among equally specific
matches, allow wins; no match ⇒ allow. ``wildcard=True`` additionally
honors the RFC's ``*`` (any chars) and trailing ``$`` (end anchor),
with rule specificity still measured by rule-string length.

Physical shape (r2 — replaces the r1 window-over-all-columns, which
shuffled every candidate row): rules are grouped per host into an
ARRAY and broadcast; each candidate row evaluates its matches inside
higher-order functions (filter/exists over the rules array). The
candidate side never shuffles and never sorts — the only exchanges in
the plan belong to the tiny rules-table groupBy and the broadcast. At
10^10 URLs that is the difference between a map-only stage and a
full-frontier shuffle per round. Plan-gated in tests/test_ids_robots.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.canonical import host_col

_END = "\x0eEND\x0e"  # private marker for a trailing $ during conversion


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


def _wildcard_pattern(prefix: Column) -> Column:
    """RFC 9309 rule → anchored regex: escape regex specials, ``*`` →
    ``.*``, a TRAILING ``$`` anchors the end (non-trailing ``$`` is
    literal). Runs once per rule on the tiny rules table."""
    esc = F.regexp_replace(prefix, r"([.\^+?(){}\[\]|\\])", r"\\$1")
    esc = F.regexp_replace(esc, r"\$", r"\\\$")  # all $ → literal
    esc = F.regexp_replace(esc, r"\\\$$", _END)  # trailing $ → marker
    body = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), F.replace(body, F.lit(_END), F.lit("$")))


def robots_filter(
    candidates: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_column: str | None = "host",
    wildcard: bool = False,
) -> DataFrame:
    """Keep only robots-allowed rows. Adds nothing; drops helpers."""
    df = with_path(candidates, url_col)
    drop_host = False
    if host_column is None:
        df = df.withColumn("_host", host_col(F.col(url_col)))
        host_column = "_host"
        drop_host = True

    spec = robots.select(
        F.col("host").alias("_r_host"),
        F.col("path_prefix").alias("_spec"),
        F.col("allow").alias("_allow"),
        F.length("path_prefix").alias("_spec_len"),
    )
    if wildcard:
        spec = spec.withColumn("_pat", _wildcard_pattern(F.col("_spec")))
    grouped = F.broadcast(
        spec.groupBy("_r_host").agg(
            F.collect_list(
                F.struct(
                    *(["_pat"] if wildcard else ["_spec"]), "_allow", "_spec_len"
                )
            ).alias("_rules")
        )
    )

    j = df.join(grouped, F.col(host_column) == F.col("_r_host"), "left")
    path = F.col("_path")
    if wildcard:
        match = lambda r: F.rlike(path, r["_pat"])  # noqa: E731
    else:
        match = lambda r: path.startswith(r["_spec"])  # noqa: E731
    matched = F.filter(F.coalesce(F.col("_rules"), F.array()), match)
    best = F.array_max(F.transform(matched, lambda r: r["_spec_len"]))
    allowed = F.when(F.size(matched) == 0, F.lit(True)).otherwise(
        F.exists(matched, lambda r: (r["_spec_len"] == best) & r["_allow"])
    )
    out = j.filter(allowed).drop("_r_host", "_rules", "_path")
    if drop_host:
        out = out.drop("_host")
    return out
