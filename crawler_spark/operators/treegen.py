"""Tree generation: fetched pages → normalized document tables
(SURVEY §1.1 ChapterTree IR; reference `treeUtils.ts:296-407`).

The reference assembles a nested ChapterTree per chapter (pages →
sentences → footnotes, plus headings) and serializes it per sink. The
graft normalizes the same IR into flat child tables keyed by the
hierarchical DSG ids (`ids.py` — getId.ts grammar):

  sentences(doc_id, sentence_id, chapter_num, page_num, sentence_num,
            text)                      — markers stripped (C13/C15)
  footnotes(sentence_id, label, position)  — position in stripped text
  headings(doc_id, chapter_num, level, text, order)

Pipeline shape: cleanup (C2-C9 chain, images already extracted
upstream) → paragraph split (C10) → sentence split (C17) — all Column
expressions — then ONE Arrow-batched pandas stage for the
running-offset footnote extraction (C13 needs cumulative-length
arithmetic; the kernel is the SAME `extract_footnotes` the sequential
oracle uses, so parity is by construction). Page number = paragraph
index within chapter, sentence number = index within paragraph
(`crawler.ts:399-402`, `thanhlinh.net/getPageContent.ts:84-137`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark import ids
from crawler_spark.functions.text import (
    cleanup_md_col,
    extract_footnotes,
    headings_col,
    remove_footnotes,
    remove_headings_col,
    split_paragraphs_col,
    split_sentences_col,
)

def default_chapter_num():
    """Chapter number: depth-0 pages are chapter 1; depth-1 chapter
    pages carry their number in the fixture/ktcgkpv URL shape
    ``..._ch_<n>_...``. (A function, not a module constant — building
    Columns needs an active session in classic mode.)"""
    return F.when(F.col("depth") == 0, F.lit(1)).otherwise(
        F.coalesce(
            F.nullif(F.regexp_extract("url", r"ch_(\d+)", 1), F.lit("")).cast("int"),
            F.lit(1),
        )
    )

_SENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("sentence_id", T.StringType(), False),
        T.StructField("chapter_num", T.IntegerType(), False),
        T.StructField("page_num", T.IntegerType(), False),
        T.StructField("sentence_num", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("fn_labels", T.ArrayType(T.StringType()), False),
        T.StructField("fn_positions", T.ArrayType(T.IntegerType()), False),
    ]
)


def build_sentence_tables(
    pages: DataFrame, chapter_num_col=None, cleanup_chain=None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """pages(url, doc_id, document_number, depth, body) →
    (sentences, footnotes, headings).

    ``cleanup_chain``: ordered step names for the markdown cleanup
    (``SiteAdapter.cleanup_chain`` — the reference's per-site
    cleanupMdProcessor step array); None = the standard chain."""
    from crawler_spark.functions.text import STANDARD_CLEANUP_CHAIN

    ch = chapter_num_col if chapter_num_col is not None else default_chapter_num()
    base = pages.select(
        "doc_id",
        F.col("document_number").cast("int").alias("doc_num"),
        ch.cast("int").alias("chapter_num"),
        cleanup_md_col(
            F.col("body"), cleanup_chain or STANDARD_CLEANUP_CHAIN
        ).alias("cleaned"),
    )

    headings = base.select(
        "doc_id",
        "chapter_num",
        F.posexplode(headings_col(F.col("cleaned"))).alias("_i", "h"),
    ).select(
        "doc_id",
        "chapter_num",
        F.col("h.level").alias("level"),
        F.col("h.text").alias("text"),
        F.col("h.order").alias("order"),
    )

    paras = base.select(
        "doc_id",
        "doc_num",
        "chapter_num",
        F.posexplode(
            split_paragraphs_col(remove_headings_col(F.col("cleaned")))
        ).alias("p_idx", "para"),
    ).withColumn("page_num", F.col("p_idx") + 1)

    sents = paras.select(
        "doc_id",
        "doc_num",
        "chapter_num",
        "page_num",
        F.posexplode(split_sentences_col(F.col("para"))).alias("s_idx", "sent"),
    ).withColumn("sentence_num", F.col("s_idx") + 1)

    withid = sents.withColumn(
        "sentence_id",
        ids.sentence_id("doc_num", "chapter_num", "page_num", "sentence_num"),
    ).select(
        "doc_id", "sentence_id", "chapter_num", "page_num", "sentence_num", "sent"
    )

    # C13: running-offset footnote extraction — same kernel as the oracle
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, labels, positions = [], [], []
            for s in pdf["sent"]:
                notes = extract_footnotes(s)
                texts.append(remove_footnotes(s))
                labels.append([n["label"] for n in notes])
                positions.append([n["position"] for n in notes])
            out = pdf.drop(columns=["sent"]).copy()
            out["text"] = texts
            out["fn_labels"] = labels
            out["fn_positions"] = positions
            yield out[[f.name for f in _SENT_SCHEMA.fields]]

    enriched = withid.mapInPandas(_extract, _SENT_SCHEMA)
    sentences = enriched.select(
        "doc_id", "sentence_id", "chapter_num", "page_num", "sentence_num", "text"
    )
    footnotes = enriched.select(
        "sentence_id",
        F.explode(F.arrays_zip("fn_labels", "fn_positions")).alias("z"),
    ).select(
        "sentence_id",
        F.col("z.fn_labels").alias("label"),
        F.col("z.fn_positions").cast("int").alias("position"),
    )
    return sentences, footnotes, headings
