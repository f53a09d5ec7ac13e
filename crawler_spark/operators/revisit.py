"""Revisit (re-crawl) scheduling from observed change history.

The reference re-crawls only via manual force flags
(`src/lib/crawler/checkpoint.ts:24-27` — forceRecrawl / forceUpdate);
an incremental crawler at 10^10 URLs has to DECIDE what to refetch.
This operator turns per-visit observations (did the page change?) into
a per-URL change-rate estimate and a next-fetch time, using the
renewal-process estimator of Cho & Garcia-Molina, "Estimating
Frequency of Change" (ACM TOIT 3(3), 2003, §4.2): with n visits over
span T of which X showed a change, the intensity estimate

    λ̂ = -ln( (n - X + 0.5) / (n + 0.5) ) / Ī,   Ī = T / (n - 1)

(Ī = the average inter-visit gap: n visits spanning T give n-1 gaps)
is consistent even though a visit only reveals *whether* the page
changed, not *how many times* (the +0.5 terms are the paper's
bias-correction for X = n). The revisit interval is 1/λ̂ clamped to
[min_interval, max_interval], anchored at the last visit.

Change observations come free from the fetch stage: a 304
(`not_modified` — see `sources/fetch.py` conditional GET) is
"unchanged"; a 200 whose content fingerprint equals the stored one is
also "unchanged"; anything else is "changed".

Physical shape: ONE partial-aggregable groupBy(url) — counts, a
conditional count, min/max timestamps — so the only exchange carries
pre-combined per-url rows. No window, no Python. Plan-gated in
tests/test_revisit.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_S = 86400.0


def revisit_schedule(
    history: DataFrame,
    min_interval_s: float = 3600.0,
    max_interval_s: float = 90 * DAY_S,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    changed_col: str = "changed",
) -> DataFrame:
    """history(url, fetch_ts:timestamp, changed:boolean) →
    (url, visits, changes, lambda_per_s, interval_s, next_fetch_ts).

    Single-visit URLs have no observable span; they get
    ``max_interval`` * the prior that a page that changed on first
    sight is fast-moving (changed → min_interval instead) — both ends
    clamp into the same [min, max] band as the estimator output.
    """
    n = F.count(F.lit(1))
    x = F.count_if(F.col(changed_col))
    t0, t1 = F.min(ts_col), F.max(ts_col)
    span_s = F.unix_timestamp(t1) - F.unix_timestamp(t0)
    agg = history.groupBy(F.col(url_col).alias("url")).agg(
        n.alias("visits"),
        x.alias("changes"),
        t0.alias("first_ts"),
        t1.alias("last_ts"),
        span_s.cast("double").alias("span_s"),
    )
    nn = F.col("visits").cast("double")
    xx = F.col("changes").cast("double")
    # λ̂ per the paper; guard span=0 (single visit / same-second burst)
    lam = F.when(
        F.col("span_s") > 0,
        -F.log((nn - xx + F.lit(0.5)) / (nn + F.lit(0.5)))
        / (F.col("span_s") / (nn - F.lit(1.0))),
    )
    # T/n in the paper is the average inter-visit gap; with n visits we
    # observed n-1 gaps over span_s, so the divisor is span/(n-1).
    interval = F.when(
        lam.isNotNull() & (lam > 0), F.lit(1.0) / lam
    ).otherwise(
        # no usable span: changed-on-sight → aggressive, else lazy
        F.when(xx > 0, F.lit(float(min_interval_s))).otherwise(
            F.lit(float(max_interval_s))
        )
    )
    interval = F.least(
        F.greatest(interval, F.lit(float(min_interval_s))),
        F.lit(float(max_interval_s)),
    )
    return agg.select(
        "url",
        "visits",
        "changes",
        F.coalesce(lam, F.lit(0.0)).alias("lambda_per_s"),
        interval.alias("interval_s"),
        F.timestamp_seconds(
            F.unix_timestamp("last_ts") + interval.cast("long")
        ).alias("next_fetch_ts"),
    )


def due_now(schedule: DataFrame, now) -> DataFrame:
    """Rows whose next_fetch_ts has passed — the refetch candidate set
    a round unions into its frontier selection. ``now`` is an explicit
    timestamp (never current_timestamp() — rounds must be replayable)."""
    return schedule.filter(F.col("next_fetch_ts") <= F.lit(now))


def observations_from_fetch(
    fetched: DataFrame,
    prior_fingerprints: DataFrame | None = None,
    ts_col: str = "fetch_ts",
) -> DataFrame:
    """Fetch results → (url, fetch_ts, changed) observations.

    A 304 (``not_modified``) is unchanged; a 200 whose body
    fingerprint equals the stored one (prior_fingerprints: url,
    fingerprint) is unchanged; any other success is changed. Failed
    fetches produce NO observation (they say nothing about content).
    The fingerprint is xxhash64 of the body — cheap, JVM-side, and the
    same function the dedup tier already uses.
    """
    ok = fetched.filter(F.col("success"))
    nm = (
        F.col("not_modified")
        if "not_modified" in fetched.columns
        else F.lit(False)
    )
    obs = ok.select(
        "url",
        F.col(ts_col).alias("fetch_ts"),
        nm.alias("_nm"),
        F.xxhash64(F.coalesce(F.col("body"), F.lit(""))).alias("fingerprint"),
    )
    if prior_fingerprints is None:
        return obs.select(
            "url", "fetch_ts", (~F.col("_nm")).alias("changed"), "fingerprint"
        )
    prior = prior_fingerprints.select(
        F.col("url").alias("_p_url"), F.col("fingerprint").alias("_p_fp")
    )
    j = obs.join(prior, obs["url"] == prior["_p_url"], "left")
    changed = (~F.col("_nm")) & (
        F.col("_p_fp").isNull() | (F.col("_p_fp") != F.col("fingerprint"))
    )
    return j.select("url", "fetch_ts", changed.alias("changed"), "fingerprint")
