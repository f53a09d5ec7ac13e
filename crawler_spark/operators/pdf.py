"""PDF text assembly (SURVEY S8/A2/C26 — `src/lib/processPDf.ts:13-97`).

The reference walks pdfjs text items per page: group items by their y
coordinate (``transform[5]``) into lines, join item strings with
spaces, clean each line (space collapse, ``( `` → ``(``, `` )`` →
``)``, `` .`` → ``.``), then stitch lines into page text inserting a
paragraph break (blank line) wherever the y-gap to the previous line
exceeds ``paragraph_spacing`` (default 18), else a plain newline.

Here the *decode* (pdf → items) is out of scope — no PDF lib exists in
this environment (SURVEY §7.5), and it is not crawl-critical. The
engine takes an **items table** (doc_id, page, idx, y, str) — what a
pdfjs/pdfium extraction stage lands — and assembles page text with
pure DataFrame ops: one groupBy builds lines (order = first item
index), a second groupBy folds lines into page text with
``F.aggregate`` (array fold, no window, no UDF). Both stages are
shuffle-on-(doc_id,page) only.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PARAGRAPH_SPACING = 18.0


def clean_pdf_line_col(c: Column) -> Column:
    """C26 cleanup chain (`processPDf.ts:4-11`), order-preserving."""
    c = F.regexp_replace(c, r" {2,}", " ")
    c = F.replace(c, F.lit("( "), F.lit("("))
    c = F.replace(c, F.lit(" )"), F.lit(")"))
    c = F.replace(c, F.lit(" ."), F.lit("."))
    return F.trim(c)


def clean_pdf_line(s: str) -> str:
    """Python mirror of :func:`clean_pdf_line_col`."""
    s = re.sub(r" {2,}", " ", s)
    s = s.replace("( ", "(").replace(" )", ")").replace(" .", ".")
    return s.strip()


def assemble_pdf_text(
    items: DataFrame, paragraph_spacing: float = DEFAULT_PARAGRAPH_SPACING
) -> DataFrame:
    """items(doc_id, page, idx, y, str) → (doc_id, page, text).

    Line order is first-occurrence order (ascending min item idx) —
    document reading order. Paragraph-break rule mirrors the reference
    exactly, including the quirk that a previous-line y of 0 (falsy in
    JS) yields a plain newline rather than a gap check.
    """
    lines = (
        items.groupBy("doc_id", "page", "y")
        .agg(
            F.min("idx").alias("line_order"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "str"))),
                    lambda s: s["str"],
                ),
                " ",
            ).alias("raw"),
        )
        .withColumn("line", clean_pdf_line_col(F.col("raw")))
    )

    per_page = lines.groupBy("doc_id", "page").agg(
        F.array_sort(F.collect_list(F.struct("line_order", "y", "line"))).alias("ls")
    )

    def _fold(acc, ln):
        gap = F.when(
            acc["i"] == 0, F.lit(0.0)
        ).when(  # JS: prevY falsy (0/undefined) → lineSpacing 0
            acc["prev_y"] == 0.0, F.lit(0.0)
        ).otherwise(F.abs(acc["prev_y"] - ln["y"]))
        text = (
            F.when(acc["i"] == 0, ln["line"])
            .when(gap > paragraph_spacing, F.concat(acc["text"], F.lit("\n\n"), ln["line"]))
            .otherwise(F.concat(acc["text"], F.lit("\n"), ln["line"]))
        )
        return F.struct(
            text.alias("text"), ln["y"].alias("prev_y"), (acc["i"] + 1).alias("i")
        )

    folded = F.aggregate(
        F.col("ls"),
        F.struct(
            F.lit("").alias("text"),
            F.lit(0.0).cast("double").alias("prev_y"),
            F.lit(0).alias("i"),
        ),
        _fold,
        lambda acc: acc["text"],
    )
    return per_page.select("doc_id", "page", folded.alias("text"))


def assemble_pdf_text_py(
    items: list[dict], paragraph_spacing: float = DEFAULT_PARAGRAPH_SPACING
) -> str:
    """Sequential mirror for one (doc_id, page): list of {idx, y, str}."""
    by_y: dict[float, list[dict]] = {}
    for it in sorted(items, key=lambda i: i["idx"]):
        by_y.setdefault(it["y"], []).append(it)
    lines = [
        {
            "order": min(i["idx"] for i in group),
            "y": y,
            "line": clean_pdf_line(" ".join(i["str"] for i in group)),
        }
        for y, group in by_y.items()
    ]
    lines.sort(key=lambda l: l["order"])
    text = ""
    prev_y = 0.0
    for i, ln in enumerate(lines):
        gap = 0.0 if (i == 0 or not prev_y) else abs(prev_y - ln["y"])
        if i == 0:
            text = ln["line"]
        elif gap > paragraph_spacing:
            text += "\n\n" + ln["line"]
        else:
            text += "\n" + ln["line"]
        prev_y = ln["y"]
    return text
