"""Composed ingest pipeline (crawler_spark/pipeline.py): differential
oracle + the plan gates for the composition contract.

The oracle is a from-scratch Python replay of all nine stages over the
same synthetic corpus — a second implementation path (driver-side
loops vs distributed plans), so partitioning/dedup/mixing bugs in
either path surface as a mismatch.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from crawler_spark.pipeline import (
    EVAL_PHRASE,
    _page_body,
    ingest_stages,
    synth_pages,
)

N_DOCS = 2000


# ---------------------------------------------------------------------------
# Python oracle
# ---------------------------------------------------------------------------


def _md_texts(n: int) -> dict[int, str]:
    from crawler_spark.functions.html import html_to_md

    return {i: html_to_md(_page_body(i)) for i in range(n)}


def _shingles(text: str) -> set:
    w = text.split()
    return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 0))}


def _uniform(key: str, seed: str) -> float:
    h = hashlib.md5(f"{key}|{seed}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def _oracle(n: int) -> dict:
    texts = _md_texts(n)
    # 2 — directives: noindex pages out
    alive = [i for i in range(n) if i % 101 != 17]
    # 4 — exact dedup, first (min doc_id) wins per byte-identical text
    first: dict[str, int] = {}
    for i in sorted(alive):
        first.setdefault(texts[i], i)
    kept = sorted(first.values())
    # 5 — near-dedup: only same-base docs can reach Jaccard >= 0.8 by
    # construction (per-doc salts cap cross-base overlap ~0.5), so the
    # oracle computes true 3-shingle Jaccard within base groups and
    # drops the larger id of each qualifying pair. Planted pairs sit
    # at J ~ 0.99, so the LSH estimate (k=128) cannot miss them.
    def _base(i: int) -> int:
        if i % 29 == 7 and i >= 2:
            return i - 2
        if i % 13 == 5 and i >= 1:
            return i - 1
        return i

    groups = defaultdict(list)
    for i in kept:
        groups[_base(i)].append(i)
    losers = set()
    for ids in groups.values():
        for a in ids:
            for b in ids:
                if a < b:
                    sa, sb = _shingles(texts[a]), _shingles(texts[b])
                    j = len(sa & sb) / len(sa | sb)
                    if j >= 0.8:
                        losers.add(b)
    near_kept = [i for i in kept if i not in losers]
    # 6 — decontamination: the planted sentence IS the 13-gram source
    clean = [i for i in near_kept if EVAL_PHRASE not in texts[i]]
    # 7 — boilerplate: lines in >= 10 docs dropped corpus-wide
    line_docs = defaultdict(set)
    doc_lines = {}
    for i in clean:
        ls = [l for l in texts[i].split("\n") if l.strip()]
        doc_lines[i] = ls
        for l in ls:
            line_docs[l].add(i)
    frequent = {l for l, d in line_docs.items() if len(d) >= 10}
    boiled = {
        i: "\n".join(l for l in doc_lines[i] if l not in frequent)
        for i in clean
    }
    # 8 — weighted mix (md5-hash Bernoulli, seed 'pipeline')
    weights = {0: 0.5, 1: 1.0, 2: 2.5}
    epochs = {}
    for i in clean:
        w = weights[i % 3]
        extra = 1 if _uniform(str(i), "pipeline") < w - int(w) else 0
        epochs[i] = int(w) + extra
    mixed = [(i, e) for i in clean for e in range(1, epochs[i] + 1)]
    # 9 — greedy first-fit packing per group of 512 doc_ids
    by_grp = defaultdict(list)
    for i, e in sorted(mixed):
        by_grp[i // 512].append((i, e, len(boiled[i].split())))
    packs = []
    for grp, rows in by_grp.items():
        fill, cur = 0, 0
        for i, e, tok in rows:
            if fill > 0 and fill + tok > 2048:
                cur, fill = cur + 1, 0
            fill += tok
            packs.append((i, e, grp, cur, tok))
    return {
        "alive": alive,
        "kept": kept,
        "near_kept": near_kept,
        "clean": clean,
        "boiled": boiled,
        "mixed": mixed,
        "packs": sorted(packs),
    }


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    from crawler_spark.sources.warc import write_warc

    d = tmp_path_factory.mktemp("pipe_warc")
    write_warc(synth_pages(spark, N_DOCS).repartition(8), str(d)).count()
    return str(d)


@pytest.fixture(scope="module")
def stages(spark, warc_dir):
    return ingest_stages(spark, warc_dir + "/*.warc.gz", materialize=True)


@pytest.fixture(scope="module")
def oracle():
    return _oracle(N_DOCS)


# ---------------------------------------------------------------------------
# plan gate that must run BEFORE the `stages` fixture caches the
# dedup output: Spark's cache manager substitutes InMemoryRelation
# into any later logically-equal subplan, changing the plan shape
# this test asserts on.
# ---------------------------------------------------------------------------


def test_exact_dedup_plan_shape(spark, warc_dir):
    st = ingest_stages(spark, warc_dir + "/*.warc.gz", materialize=False)
    plan = st["exact_dedup"]._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # exactly two exchanges: the content-hash window + the pinned
    # doc_id repartition; the window gets a partial WindowGroupLimit
    # below its exchange (first-wins prunes map-side)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2
    assert "REPARTITION_BY_NUM" in plan
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", plan)) == 2  # partial+final


# ---------------------------------------------------------------------------
# differential-oracle tests
# ---------------------------------------------------------------------------


def test_stage_counts_match_oracle(stages, oracle):
    assert stages["warc_read"].count() == N_DOCS
    assert stages["directives"].count() == len(oracle["alive"])
    assert stages["exact_dedup"].count() == len(oracle["kept"])
    assert stages["near_dedup"].count() == len(oracle["near_kept"])
    assert stages["decontaminate"].count() == len(oracle["clean"])
    assert stages["mix"].count() == len(oracle["mixed"])


def test_boilerplate_text_matches_oracle(stages, oracle):
    got = {
        r["doc_id"]: r["text"]
        for r in stages["boilerplate"].collect()
    }
    assert got == oracle["boiled"]


def test_pack_rows_match_oracle(stages, oracle):
    got = sorted(
        (r.doc_id, r.epoch, r.pack_group, r.bin_idx, r.n_tokens)
        for r in stages["pack"].collect()
    )
    assert got == oracle["packs"]


# ---------------------------------------------------------------------------
# plan gates (the composition contract)
# ---------------------------------------------------------------------------


def _final_plan(df) -> str:
    # run through the SAME java DF so the AQE plan is final, then keep
    # only the final-plan section (toString appends the initial plan)
    df.collect()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_composed_chain_exchange_budget(stages):
    plan = _final_plan(stages["pack"])
    real = re.findall(r"(?<!Reused)Exchange hashpartitioning\((\w+)", plan)
    # ONE pinned doc_id partitioning for the whole chain (it lives
    # inside the cached exact-dedup build); no downstream stage may
    # re-shuffle on doc_id
    assert plan.count("REPARTITION_BY_NUM") == 1, real
    ensure_doc = re.findall(
        r"(?<!Reused)Exchange hashpartitioning\(doc_id#\d+L?, \d+\), ENSURE",
        plan,
    )
    assert ensure_doc == [], ensure_doc
    # total corpus-sized exchanges stay within the documented budget
    # (band join + pair dedup + losers/contaminated distincts may
    # broadcast away at this scale; the gate is an upper bound)
    assert len(real) <= 9, real


def test_doc_keyed_aggs_reuse_pinned_partitioning(stages):
    # the boilerplate reassembly (collect_list per doc) must sit
    # directly on the cached scan — partial+final ObjectHashAggregate
    # with no exchange between them or below
    plan = _final_plan(stages["boilerplate"])
    m = re.search(
        r"ObjectHashAggregate.*?partial_collect_list.*?\n(.*?)InMemoryTableScan",
        plan,
        re.S,
    )
    assert m is not None, plan[:2000]
    assert "Exchange hashpartitioning(doc_id" not in m.group(1)


def test_csr_recover_stage_surfaces_payload_text(spark, tmp_path):
    """csr_recover=True: a thin-shell CSR page in the WARC contributes
    its hydration-payload text to the clean stage; default keeps the
    legacy bytes (opt-in, so the stage-count oracles above stay
    valid)."""
    from crawler_spark.sources.warc import write_warc

    csr_body = (
        '<html><body><div id="__next"></div>'
        '<script id="__NEXT_DATA__" type="application/json">'
        '{"props":{"article":{"body":"Only in the payload."}}}'
        "</script></body></html>"
    )
    pages = spark.createDataFrame(
        [("http://h0.example/p/0", 200, csr_body)],
        "url string, status int, body string",
    )
    d = str(tmp_path / "csr_warc")
    write_warc(pages, d).count()

    on = ingest_stages(spark, d + "/*.warc.gz", csr_recover=True)
    txt = on["clean"].select("text").first()["text"]
    assert "Only in the payload." in txt

    off = ingest_stages(spark, d + "/*.warc.gz")
    txt_off = off["clean"].select("text").first()["text"]
    assert "Only in the payload." not in txt_off
