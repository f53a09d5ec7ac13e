"""Tree generation parity: the Spark sentence/footnote/heading tables
must match a sequential computation using the Python function twins
over the same fixture pages (same kernels ⇒ byte parity)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from crawler_spark import ids
from crawler_spark.functions import text as tx
from crawler_spark.operators.treegen import build_sentence_tables


@pytest.fixture(scope="module")
def pages_df(spark, world):
    rows = []
    for url, p in world.pages.items():
        m = re.search(r"/doc/(\d+)", url)
        doc_num = int(m.group(1)) if m else 0
        depth = 1 if "ch_" in url else 0
        rows.append((url, f"DSG_{doc_num:03d}", doc_num, depth, p.body))
    return spark.createDataFrame(
        rows, "url string, doc_id string, document_number int, depth int, body string"
    )


def _oracle_tables(world):
    sentences, footnotes, headings = set(), set(), set()
    for url, p in world.pages.items():
        m = re.search(r"/doc/(\d+)", url)
        doc_num = int(m.group(1)) if m else 0
        doc_id = f"DSG_{doc_num:03d}"
        if "ch_" in url:
            ch = int(re.search(r"ch_(\d+)", url).group(1))
        else:
            ch = 1
        cleaned = tx.cleanup_md(p.body)
        for h in tx.extract_headings(cleaned):
            headings.add((doc_id, ch, h["level"], h["text"], h["order"]))
        body = tx.remove_headings(cleaned)
        for p_idx, para in enumerate(tx.split_paragraphs(body), start=1):
            for s_idx, sent in enumerate(tx.split_sentences(para), start=1):
                sid = f"DSG_{doc_num:03d}.{ch:03d}.{p_idx:03d}.{s_idx:02d}"
                notes = tx.extract_footnotes(sent)
                sentences.add((doc_id, sid, ch, p_idx, s_idx, tx.remove_footnotes(sent)))
                for n in notes:
                    footnotes.add((sid, n["label"], n["position"]))
    return sentences, footnotes, headings


def test_tree_tables_match_oracle(spark, world, pages_df):
    s_df, f_df, h_df = build_sentence_tables(pages_df)
    got_s = {
        (r["doc_id"], r["sentence_id"], r["chapter_num"], r["page_num"],
         r["sentence_num"], r["text"])
        for r in s_df.collect()
    }
    got_f = {(r["sentence_id"], r["label"], r["position"]) for r in f_df.collect()}
    got_h = {
        (r["doc_id"], r["chapter_num"], r["level"], r["text"], r["order"])
        for r in h_df.collect()
    }
    want_s, want_f, want_h = _oracle_tables(world)
    assert got_s == want_s
    assert got_f == want_f
    assert got_h == want_h
    assert len(got_s) > 40 and len(got_f) > 0 and len(got_h) > 0


def test_sentence_ids_parse_back(spark, pages_df):
    s_df, _, _ = build_sentence_tables(pages_df)
    parsed = s_df.select(
        "sentence_id", "chapter_num", "page_num", "sentence_num",
        *[v.alias(k) for k, v in ids.parse_id_cols(F.col("sentence_id")).items()],
    ).collect()
    for r in parsed:
        assert r["level"] == "sentence"
        assert (r["chapter"], r["page"], r["sentence"]) == (
            r["chapter_num"], r["page_num"], r["sentence_num"],
        )
