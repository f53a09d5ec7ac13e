"""Corpus analysis + export sinks (SURVEY §3.3 `src/analyze.ts` and
§2.2 K2/K3 serializers) over the normalized tree tables.

`analyze.ts:87-223` folds the whole corpus in driver memory: totals,
per-genre stats with shares, NER label counts, top-5 labels. Here the
same numbers come from rollup/window aggregations; the export sinks
rebuild the nested ChapterTree from the flat child tables (groupBy +
sorted collect_list — one shuffle keyed by chapter) and stringify via
``to_json`` / an XML pandas kernel with the reference's attr casing
(camelCase → SNAKE_UPPER, `treeUtils.ts:175-183`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_stats(sentences: DataFrame, genre_of_doc: DataFrame) -> DataFrame:
    """Per-genre rollup with grand total + share columns
    (`analyze.ts:102-217`: files/pages/sentences/words, avg words per
    sentence, % of total sentences).

    sentences(doc_id, sentence_id, chapter_num, page_num, sentence_num,
    text); genre_of_doc(doc_id, genre).
    """
    words = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: F.length(w) > 0)
    )
    per = (
        sentences.join(F.broadcast(genre_of_doc), "doc_id")
        .withColumn("n_words", words)
        .rollup("genre")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_files"),
            F.countDistinct("doc_id", "chapter_num", "page_num")
            .cast("bigint")
            .alias("n_pages"),
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.round(F.sum("n_words") / F.count(F.lit(1)), 4).alias(
                "avg_words_per_sentence"
            ),
        )
    )
    total = Window.partitionBy(F.lit(1))
    return per.withColumn(
        "sentence_share",
        F.round(F.col("n_sentences") / F.max(
            F.when(F.col("genre").isNull(), F.col("n_sentences"))
        ).over(total), 6),
    ).select(
        F.coalesce(F.col("genre"), F.lit("ALL")).alias("genre"),
        "n_files", "n_pages", "n_sentences", "n_words",
        "avg_words_per_sentence", "sentence_share",
    )


def _chapter_nest(sentences: DataFrame, footnotes: DataFrame) -> DataFrame:
    """Rebuild the nested chapter structure: one row per (doc_id,
    chapter_num) with pages → sentences → footnotes arrays in order."""
    fns = footnotes.groupBy("sentence_id").agg(
        F.array_sort(
            F.collect_list(F.struct("position", "label"))
        ).alias("footnotes")
    )
    s = sentences.join(fns, "sentence_id", "left").withColumn(
        "footnotes", F.coalesce(F.col("footnotes"), F.array())
    )
    pages = (
        s.groupBy("doc_id", "chapter_num", "page_num")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("sentence_num", "sentence_id", "text", "footnotes")
                )
            ).alias("sentences")
        )
        .groupBy("doc_id", "chapter_num")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("page_num", "sentences"))
            ).alias("pages")
        )
    )
    return pages


def export_json(sentences: DataFrame, footnotes: DataFrame) -> DataFrame:
    """K3: one JSON document per chapter (`treeUtils.ts:292-294`)."""
    nest = _chapter_nest(sentences, footnotes)
    return nest.select(
        "doc_id",
        "chapter_num",
        F.to_json(F.struct("doc_id", "chapter_num", "pages")).alias("json"),
    )


def _xml_text(v) -> str:
    return (
        str(v).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _xml_attr(v) -> str:
    return _xml_text(v).replace('"', "&quot;")


def export_xml(sentences: DataFrame, footnotes: DataFrame) -> DataFrame:
    """K2: XML per chapter — FILE→SECT→PAGE→STC with SNAKE_UPPER attrs
    (`treeUtils.ts:92-290` shape; attribute casing :175-183). Every
    text node AND attribute value is escaped — footnote labels and ids
    included, so a label containing ``&``/``<``/``"`` still yields
    well-formed XML."""
    import pandas as pd

    nest = _chapter_nest(sentences, footnotes)

    def _xml(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = []
        for _, r in pdf.iterrows():
            parts = [
                f'<FILE ID="{_xml_attr(r["doc_id"])}">'
                f'<SECT NUMBER="{_xml_attr(r["chapter_num"])}">'
            ]
            for page in r["pages"]:
                parts.append(f'<PAGE NUMBER="{_xml_attr(page["page_num"])}">')
                for s in page["sentences"]:
                    sid = _xml_attr(s["sentence_id"])
                    parts.append(f'<STC ID="{sid}">{_xml_text(s["text"])}</STC>')
                    for fn in s["footnotes"]:
                        parts.append(
                            f'<FOOTNOTE STC_ID="{sid}" '
                            f'POSITION="{_xml_attr(fn["position"])}">'
                            f'{_xml_text(fn["label"])}</FOOTNOTE>'
                        )
                parts.append("</PAGE>")
            parts.append("</SECT></FILE>")
            docs.append("".join(parts))
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "chapter_num": pdf["chapter_num"], "xml": docs}
        )

    return nest.mapInPandas(
        lambda it: (_xml(pdf) for pdf in it),
        "doc_id string, chapter_num int, xml string",
    )


def export_csv(sentences: DataFrame) -> DataFrame:
    """K4: per-chapter CSV (`treeUtils.ts:447-482` generateCsvTree):
    header ``"sentence_id","language_code","text"``; one row per
    sentence as ``"id","lang", "text"`` — including the reference's
    literal space before the text field — with quote-doubling applied
    to the text only, and a final trim. Pure JVM expressions: the line
    builds with concat/regexp_replace, chapters assemble with one
    sorted collect_list per chapter (same single shuffle as the other
    tree sinks).

    ``sentences`` needs (doc_id, chapter_num, page_num, sentence_num,
    sentence_id, text[, language_code])."""
    lang = (
        F.col("language_code")
        if "language_code" in sentences.columns
        else F.lit("")
    )
    line = F.concat(
        F.lit('"'), F.col("sentence_id"),
        F.lit('","'), lang,
        F.lit('", "'), F.regexp_replace(F.col("text"), '"', '""'),
        F.lit('"'),
    )
    rows = sentences.select(
        "doc_id", "chapter_num",
        F.struct("page_num", "sentence_num", line.alias("line")).alias("r"),
    )
    header = '"sentence_id","language_code","text"'
    return (
        rows.groupBy("doc_id", "chapter_num")
        .agg(F.array_sort(F.collect_list("r")).alias("rs"))
        .select(
            "doc_id",
            "chapter_num",
            F.concat_ws(
                "\n",
                F.lit(header),
                F.concat_ws("\n", F.transform(F.col("rs"), lambda s: s["line"])),
            ).alias("csv"),
        )
    )
