"""Composed ingest pipeline: the full training-data chain as ONE
lazily-composed DataFrame program, plus the deterministic synthetic
web corpus it is benchmarked over.

The chain mirrors the reference's crawl -> clean -> publish flow
(reference src/main.ts round loop feeding the content sinks) extended
with the LLM-pipeline stages this engine adds on top:

  WARC read -> directives -> clean chain -> exact dedup -> MinHash-LSH
  near-dedup -> decontaminate -> line boilerplate -> weighted mix ->
  sequence pack

Every stage is the PRODUCTION operator (sources/warc.py,
functions/html.py, functions/pii.py, operators/dedup.py,
operators/similarity.py, operators/mixing.py) — not a bench-only
re-implementation — so what tools/bench_pipeline.py measures is what
the engine ships.

Composition contract (the 100 TB story, gated by
tests/test_pipeline_compose.py):

* ONE pinned ``repartition(P, doc_id)`` right after exact dedup is the
  only doc-keyed exchange in the whole chain. Every downstream
  doc-keyed aggregation — the minhash shingle distinct + signature
  agg, the decontamination hit count, the boilerplate reassembly —
  satisfies its ClusteredDistribution from that one HashPartitioning
  (Spark skips the exchange when the child partitioning's expressions
  are a subset of the required clustering), so
  ``hashpartitioning(doc_id`` appears EXACTLY ONCE in the composed
  plan.
* Genuinely-small sides broadcast: the benchmark 13-gram set and the
  boilerplate frequent-line set ride BroadcastExchange. The near-dup
  loser set and the contaminated-doc set do NOT — both are O(corpus)
  at real dup/contamination rates, so they anti-join on the pinned
  doc_id partitioning instead (zero extra exchange, any size).
* The remaining exchanges are each a DIFFERENT key, forced by the
  semantics: content hash (exact dedup), LSH band bucket (the
  candidate self-join), candidate-pair dedup, boilerplate line
  frequency, pack group. No key is shuffled twice.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# deterministic synthetic web corpus
# ---------------------------------------------------------------------------

#: the "leaked benchmark" sentence planted into contaminated pages —
#: 14 words so it yields full 13-gram matches on the doc side.
EVAL_PHRASE = (
    "eval benchmark item alpha bravo charlie delta echo foxtrot "
    "golf hotel india juliett kilo"
)

_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("body", T.StringType()),
    ]
)

_POOL = None


def _pool() -> list[str]:
    """Seeded shared word pool (~3M words): documents are slices of
    it, so generation is O(doc length), not O(pool). 'the' rides at
    ~6% so the corpus passes token-level language gates."""
    global _POOL
    if _POOL is None:
        import numpy as np

        rng = np.random.default_rng(4242)
        vocab = [f"w{i:04d}" for i in range(4000)] + ["the"] * 250
        idx = rng.integers(0, len(vocab), 3_000_000)
        _POOL = [vocab[i] for i in idx.tolist()]
    return _POOL


def _para(salt: int, start: int, n_words: int) -> str:
    """One paragraph: a pool slice with every 16th word replaced by a
    per-document salt token. Twins share the salt (their texts stay
    identical/near-identical), while unrelated documents whose slices
    happen to overlap in the pool diverge on ~5/16 of their 3-shingles
    — word-level Jaccard ~0.5, safely under the near-dup threshold, so
    the planted dup populations are the ONLY dups (closed-form oracle
    counts)."""
    pool = _pool()
    start = start % (len(pool) - n_words - 1)
    ws = pool[start : start + n_words]
    ws[::16] = [f"s{salt}"] * len(ws[::16])
    return " ".join(ws)


def _text_paras(doc_id: int) -> list[str]:
    """The paragraph list a doc RENDERS (near-dup tail and
    contamination included) — exact twins reuse this wholesale so
    they really are byte-identical to their base's rendered text."""
    near = doc_id % 13 == 5 and doc_id >= 1
    base = doc_id - 1 if near else doc_id
    n_paras = 5 + (base % 8)
    start0 = (base * 104729) % 2_500_000
    salt = base % 99991
    paras = [
        _para(salt, start0 + j * 211, 110 + ((base + j * 13) % 70))
        for j in range(n_paras)
    ]
    if near:
        paras.append("zulu yankee xray whiskey victor")
    if doc_id % 41 == 3:
        paras.append("as seen in " + EVAL_PHRASE + " official results")
    return paras


def _page_body(doc_id: int) -> str:
    """One synthetic HTML page. Planted populations (all by id
    arithmetic, so oracle counts are closed-form):

    * ``id % 29 == 7``  -> EXACT duplicate of doc id-2: the FULL
      rendered text of the base — including the base's own near-dup
      tail or contamination when it has one (r5 review: re-deriving
      from components broke byte-identity for ~12% of plants) — so
      cleaned text is byte-identical and only the URL differs.
    * ``id % 13 == 5``  -> NEAR duplicate of doc id-1 (same paragraphs
      plus a 5-word tail — 3-shingle Jaccard ~0.99).
    * ``id % 41 == 3``  -> contaminated (EVAL_PHRASE appended; an
      exact twin carries its BASE's contamination state, since its
      text is the base's text).
    * ``id % 101 == 17`` -> <meta name=robots content=noindex>
      (doc-own: the attribute is markup, not text).

    Every page carries the promo-banner header and copyright footer
    lines the boilerplate stage must strip.
    """
    exact = doc_id % 29 == 7 and doc_id >= 2
    base = doc_id - 2 if exact else doc_id
    paras = _text_paras(base)
    meta = (
        '<meta name="robots" content="noindex">'
        if doc_id % 101 == 17
        else ""
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    # title/header/h1 all key off BASE so exact twins stay
    # byte-identical after the clean chain (html_to_md keeps the title
    # text); only the URL distinguishes them — the realistic exact-dup
    # shape (same content served at two URLs)
    return (
        f"<html><head><title>Doc {base}</title>{meta}</head><body>\n"
        f"<p>promo banner variant {base % 5}</p>\n"
        f"<h1>Document {base}</h1>\n"
        f"{body_paras}\n"
        f"<p>copyright footer all rights reserved</p>\n"
        f"</body></html>"
    )


def synth_pages(spark: SparkSession, n_docs: int, n_hosts: int = 1000) -> DataFrame:
    """(url, status, body) for ``n_docs`` deterministic pages — the
    input write_warc archives. Pure function of doc_id: any worker,
    any partitioning, any run produces identical bytes."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [
                        f"http://h{i % n_hosts}.example/p/{i}" for i in ids
                    ],
                    "status": [200] * len(ids),
                    "body": [_page_body(i) for i in ids],
                }
            )

    return spark.range(n_docs).mapInPandas(_gen, _PAGE_SCHEMA)


# ---------------------------------------------------------------------------
# stage builders
# ---------------------------------------------------------------------------


@pandas_udf(T.BooleanType())
def _noindex_udf(body: pd.Series) -> pd.Series:
    """Arrow-batched page_directives noindex bit (the fetch-boundary
    directive check, reference conggiao.org/getPageContent.ts's
    skip-page analog)."""
    from crawler_spark.functions.html import page_directives

    return body.map(
        lambda h: page_directives(h)[0] if h is not None else False
    )


def _gram_exprs(n: int) -> tuple[str, str]:
    """The ONE definition of the n-gram hashing both the benchmark
    side and the corpus side use: (positions-SQL over a word array
    column ``w``, gram-hash-SQL over ``w`` and a position ``i``).
    Sharing it is load-bearing — if the two sides hashed grams
    differently, decontamination would silently match nothing."""
    pos = (
        f"CASE WHEN size(w) >= {n} THEN sequence(1, size(w) - {n - 1}) "
        "ELSE array() END"
    )
    gram = f"xxhash64(concat_ws(' ', slice(w, i, {n})))"
    return pos, gram


def bench_grams(spark: SparkSession, phrases: list[str], n: int = 13) -> DataFrame:
    """Distinct xxhash64 13-grams of the decontamination benchmark
    set — tiny by construction, always broadcast."""
    pos, gram = _gram_exprs(n)
    bench = spark.createDataFrame([(p,) for p in phrases], ["p"])
    return (
        bench.select(F.split(F.trim("p"), r"\s+").alias("w"))
        .select("w", F.explode(F.expr(pos)).alias("i"))
        .select(F.expr(gram).alias("gram"))
        .distinct()
    )


def ingest_stages(
    spark: SparkSession,
    warc_glob: str,
    *,
    bench_phrases: list[str] | None = None,
    mix_weights: dict[str, float] | None = None,
    min_est_jaccard: float = 0.8,
    boiler_min_docs: int = 10,
    pack_budget: int = 2048,
    pack_group: int = 512,
    materialize: bool = False,
    csr_recover: bool = False,
) -> dict[str, DataFrame]:
    """The composed chain, returned as an ordered {stage: DataFrame}
    dict — each value is the pipeline truncated after that stage, so a
    caller can time the waterfall or plan-audit the whole program.

    ``materialize=False`` keeps the program one lazy composition (the
    plan-gate view). ``materialize=True`` persists (MEMORY_AND_DISK)
    the exact-dedup output and the minhash signatures — the
    production setting, same trade as near_duplicate_images r5: the
    post-dedup projection is consumed by four subplans and its
    lineage contains the Python clean chain, so lazy re-derivation
    costs 4x the decode while the cache is O(corpus) bytes once.
    persist over localCheckpoint is deliberate: InMemoryRelation
    keeps the pinned hashpartitioning(doc_id) visible to Catalyst
    (checkpointing reports UnknownPartitioning and re-shuffles every
    doc-keyed consumer — 4 extra corpus exchanges, measured in the
    composed-pipeline audit).
    """
    from crawler_spark.functions.html import html_to_md_udf
    from crawler_spark.functions.pii import scrub_pii_col
    from crawler_spark.operators.dedup import first_wins
    from crawler_spark.operators.mixing import weighted_sample
    from crawler_spark.operators.similarity import minhash_pairs
    from crawler_spark.sources.warc import read_warc

    bench_phrases = bench_phrases or [EVAL_PHRASE]
    mix_weights = mix_weights or {"d0": 0.5, "d1": 1.0, "d2": 2.5}
    stages: dict[str, DataFrame] = {}

    # 1 — WARC read: binaryFile fan-out, members parse Arrow-batched
    read = (
        read_warc(spark, warc_glob)
        .filter((F.col("warc_type") == "response") & (F.col("status") == 200))
        .select("uri", "body")
    )
    stages["warc_read"] = read

    # 2 — on-page directives: noindex pages leave the corpus here,
    # BEFORE any expensive text work (map-only)
    directed = read.filter(~_noindex_udf("body"))
    stages["directives"] = directed

    # 3 — clean chain: HTML -> markdown (Arrow-batched) + PII scrub
    # (JVM regexp chain); doc identity comes from the URL (map-only).
    # csr_recover=True prepends hydration-payload/noscript recovery
    # (functions/hydration.py) so thin-shell client-rendered pages
    # contribute their serialized content — still one Python boundary
    # (adjacent pandas UDFs fuse into the same ArrowEvalPython stage)
    body_col = F.col("body")
    if csr_recover:
        from crawler_spark.functions.hydration import recover_csr_udf

        body_col = recover_csr_udf(body_col)
    cleaned = directed.select(
        F.regexp_extract("uri", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        scrub_pii_col(html_to_md_udf(body_col)).alias("text"),
    )
    stages["clean"] = cleaned

    # 4 — exact dedup (content-hash first-wins), then THE pinned
    # doc-keyed partitioning: the one hashpartitioning(doc_id) every
    # downstream doc-keyed aggregation reuses
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    deduped = (
        first_wins(
            cleaned.withColumn("text_hash", F.md5("text")),
            "text_hash",
            [F.col("doc_id")],
        )
        .select("doc_id", "text")
        .repartition(n_parts, "doc_id")
    )
    if materialize:
        from pyspark import StorageLevel

        deduped = deduped.persist(StorageLevel.MEMORY_AND_DISK)
    stages["exact_dedup"] = deduped

    # 5 — MinHash-LSH near-dedup: candidate pairs from the production
    # operator, losers (larger id of each pair) broadcast-anti-joined
    # out. Signatures aggregate on the pinned partitioning (no
    # exchange); only the band-bucket self-join shuffles.
    pairs = minhash_pairs(
        deduped,
        "doc_id",
        "text",
        k=128,
        bands=32,
        min_est_jaccard=min_est_jaccard,
        materialize_signatures=materialize,
    )
    losers = pairs.select(
        F.greatest("doc_a", "doc_b").alias("doc_id")
    ).distinct()
    # anti join, NOT broadcast: at production dup rates the loser set
    # is a constant fraction of the corpus. Both sides hash on doc_id
    # (left: the pinned repartition; right: the distinct), so the anti
    # join adds no exchange beyond the distinct's own.
    near_deduped = deduped.join(losers, "doc_id", "left_anti")
    stages["near_dedup"] = near_deduped

    # 6 — decontamination: doc 13-grams travel as xxhash64 longs,
    # benchmark grams broadcast, hit count aggregates on the pinned
    # partitioning (no exchange)
    n = 13
    pos, gram = _gram_exprs(n)
    bg = bench_grams(spark, bench_phrases, n=n)
    dw = near_deduped.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    contaminated = (
        dw.select("doc_id", "w", F.explode(F.expr(pos)).alias("i"))
        .select("doc_id", F.expr(gram).alias("gram"))
        .join(F.broadcast(bg), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # same anti-join shape as the near-dup losers: the contaminated
    # set scales with the corpus, the pinned partitioning makes the
    # join exchange-free on the left
    decontaminated = near_deduped.join(contaminated, "doc_id", "left_anti")
    stages["decontaminate"] = decontaminated

    # 7 — line-level boilerplate: lines appearing in >= boiler_min_docs
    # docs are dropped corpus-wide; the frequent-line set broadcasts
    # back and docs reassemble on the pinned partitioning
    # markdown is line-structured: split on newlines, drop blanks.
    # posexplode keeps the original order key for reassembly.
    lines = decontaminated.select(
        "doc_id",
        F.posexplode(F.split(F.coalesce("text", F.lit("")), r"\n")).alias(
            "pos", "line"
        ),
    ).filter(F.trim("line") != "")
    freq = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= boiler_min_docs)
        .select("line")
    )
    boiled = (
        lines.join(F.broadcast(freq), "line", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("text")
        )
    )
    stages["boilerplate"] = boiled

    # 8 — deterministic weighted mixing (map-only): domains down/up
    # sample by hash-Bernoulli, upsampled copies gain epoch ids
    mixed = weighted_sample(
        boiled.withColumn(
            "domain",
            F.concat(F.lit("d"), (F.col("doc_id") % 3).cast("string")),
        ),
        domain_col="domain",
        key_col="doc_id",
        weights=mix_weights,
        seed="pipeline",
    )
    stages["mix"] = mixed

    # 9 — token-budget sequence packing: greedy first-fit per pack
    # group (the one exchange whose key a prior stage cannot supply)
    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "epoch"]).reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for tok in pdf["tok"]:
            if fill > 0 and fill + tok > pack_budget:
                cur += 1
                fill = 0
            fill += int(tok)
            bins.append(cur)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "epoch": pdf["epoch"],
                "pack_group": pdf["grp"],
                "bin_idx": bins,
                "n_tokens": pdf["tok"],
            }
        )

    packed = (
        mixed.select(
            "doc_id",
            "epoch",
            (F.col("doc_id") / pack_group).cast("long").alias("grp"),
            F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"))
            .cast("long")
            .alias("tok"),
        )
        .groupBy("grp")
        .applyInPandas(
            _pack,
            "doc_id long, epoch int, pack_group long, bin_idx long, n_tokens long",
        )
    )
    stages["pack"] = packed
    return stages


#: per-stage force expressions for waterfall timing — an aggregate
#: that depends on the stage's payload column, so count-style pruning
#: cannot skip the stage's actual work.
STAGE_FORCE = {
    "warc_read": lambda df: df.agg(F.sum(F.length("body"))),
    "directives": lambda df: df.agg(F.sum(F.length("body"))),
    "clean": lambda df: df.agg(F.sum(F.length("text")), F.sum("doc_id")),
    "exact_dedup": lambda df: df.agg(F.sum(F.length("text")), F.sum("doc_id")),
    "near_dedup": lambda df: df.agg(F.sum(F.length("text")), F.sum("doc_id")),
    "decontaminate": lambda df: df.agg(F.sum(F.length("text")), F.sum("doc_id")),
    "boilerplate": lambda df: df.agg(F.sum(F.length("text")), F.sum("doc_id")),
    "mix": lambda df: df.agg(F.sum(F.length("text")), F.sum("epoch")),
    "pack": lambda df: df.agg(F.sum("bin_idx"), F.sum("n_tokens"), F.count("*")),
}
