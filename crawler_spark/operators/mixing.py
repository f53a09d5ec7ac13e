"""Deterministic weighted data mixing — the training-data pipeline's
final stage.

Given a cleaned corpus and per-domain mixture weights (hand-set, or
temperature-derived from domain sizes as in the public multilingual-LM
recipes), emit a sample where each domain appears at its target rate,
including UPSAMPLING (weight > 1 → whole repeat epochs plus a
fractional-remainder Bernoulli draw).

Design constraints at 100 TB (and why this shape):

  * deterministic — the same (row key, seed) is kept in every run, on
    any cluster size, with no RNG state: selection is a pure md5 hash
    of the key, cross-engine stable, so a DuckDB oracle replays the
    EXACT sample (the same trick as q43's HLL registers);
  * map-only — no shuffle: weights enter as a literal map (domains are
    few) and every row decides its own fate; upsampled copies come
    from explode(sequence(1, n)) with an ``epoch`` column so repeats
    stay distinguishable downstream (packing, shuffling);
  * rate computation (`temperature_weights`) needs only the per-domain
    row counts — one partial-aggregable groupBy whose result is
    O(#domains), the one deliberate driver-side collect (same class as
    broadcast IVF centroids).

The reference has no mixing stage (its corpus is site-curated);
this follows the published temperature-sampling formulation
(p_i ∝ c_i^(1/τ), τ ≥ 1 flattens the domain distribution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^32 — md5-prefix space; u = prefix/2^32 is uniform on [0, 1)
_HASH_SPACE = float(1 << 32)


def det_uniform_col(key: Column, seed: int | str = 0) -> Column:
    """Deterministic uniform [0, 1) from a row key: the first 8 hex
    chars of md5(key|seed) over 2^32. Cross-engine: DuckDB's
    ``('0x' || substr(md5(key || '|' || seed), 1, 8))::UBIGINT /
    4294967296.0`` yields the identical value, so oracles replay the
    exact sample."""
    h = F.md5(F.concat_ws("|", key.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def weighted_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    weights: dict[str, float],
    seed: int | str = 0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Each row of domain d is emitted ``floor(w_d)`` times plus one
    more with probability ``frac(w_d)`` (hash-Bernoulli on the row
    key). Domains absent from ``weights`` get rate 0. Map-only; the
    output gains ``epoch_col`` (1..n) distinguishing repeats."""
    if not weights:
        raise ValueError("weighted_sample: empty weights")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weighted_sample: negative weight")
    m = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    w = F.coalesce(m[F.col(domain_col)], F.lit(0.0))
    u = det_uniform_col(F.col(key_col), seed)
    n = (F.floor(w) + (u < (w - F.floor(w))).cast("bigint")).cast("int")
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def temperature_weights(
    counts: dict[str, int], temperature: float, target_rows: float
) -> dict[str, float]:
    """Per-domain sampling weights for temperature-mixed sampling:
    p_i ∝ c_i^(1/τ) (τ=1 → natural proportions; τ→∞ → uniform across
    domains), scaled so the EXPECTED output size is ``target_rows``.
    Weights may exceed 1 (small domains upsample) — that is the
    point of temperature mixing."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if not counts:
        return {}
    powed = {d: c ** (1.0 / temperature) for d, c in counts.items() if c > 0}
    z = sum(powed.values())
    return {d: target_rows * (p / z) / counts[d] for d, p in powed.items()}


def deterministic_shuffle(df: DataFrame, key_col: str, seed: int | str = 0) -> DataFrame:
    """Global pseudo-random training order: sort by md5(key|seed).
    One range exchange (the sort a training-data writer pays anyway);
    the order is a pure function of (key, seed) — identical on any
    cluster size or run, and replayable by an oracle. Pair with
    ``epoch`` keys from :func:`weighted_sample` so upsampled copies
    of a document land far apart (key the hash on (doc, epoch))."""
    return df.orderBy(det_uniform_col(F.col(key_col), seed), F.col(key_col))


def mix_corpus(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    temperature: float,
    target_rows: float,
    seed: int | str = 0,
) -> DataFrame:
    """Temperature-mix ``df`` to an expected ``target_rows`` output:
    one O(#domains) count agg (the only driver-side step), then the
    map-only hash sample."""
    counts = {
        r[0]: r[1] for r in df.groupBy(domain_col).count().collect()
    }
    return weighted_sample(
        df,
        domain_col,
        key_col,
        temperature_weights(counts, temperature, target_rows),
        seed=seed,
    )
