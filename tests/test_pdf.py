"""PDF text assembly: Spark fold vs sequential mirror on synthetic
item layouts (line grouping, cleanup chain, paragraph-gap rule incl.
the JS falsy-prev-y quirk)."""

from __future__ import annotations

import random

from crawler_spark.operators.pdf import (
    assemble_pdf_text,
    assemble_pdf_text_py,
    clean_pdf_line,
)


def test_clean_pdf_line():
    assert clean_pdf_line("a  b   c") == "a b c"
    assert clean_pdf_line("( x )  and y .") == "(x) and y."
    assert clean_pdf_line("  padded  ") == "padded"


def _world(seed=5, n_docs=3, n_pages=3):
    rnd = random.Random(seed)
    rows = []
    for d in range(n_docs):
        for p in range(1, n_pages + 1):
            idx = 0
            y = 760.0
            for _ in range(rnd.randrange(4, 9)):  # lines top-down
                n_items = rnd.randrange(1, 4)
                for _ in range(n_items):
                    rows.append((d, p, idx, y, rnd.choice(
                        ["Lời", "Chúa (", "ở )", "đây .", "và  hai  khoảng", "chữ"]
                    )))
                    idx += 1
                y -= rnd.choice([12.0, 14.0, 30.0, 0.0])  # 0 → same line later
    return rows


def test_spark_matches_sequential(spark):
    rows = _world()
    df = spark.createDataFrame(
        rows, "doc_id int, page int, idx int, y double, str string"
    )
    got = {
        (r["doc_id"], r["page"]): r["text"]
        for r in assemble_pdf_text(df).collect()
    }
    for (d, p) in got:
        items = [
            {"idx": i, "y": y, "str": s}
            for (dd, pp, i, y, s) in rows
            if dd == d and pp == p
        ]
        assert got[(d, p)] == assemble_pdf_text_py(items), (d, p)


def test_paragraph_gap_rule(spark):
    rows = [
        (0, 1, 0, 700.0, "dòng một"),
        (0, 1, 1, 688.0, "dòng hai"),   # gap 12 ≤ 18 → "\n"
        (0, 1, 2, 650.0, "đoạn mới"),   # gap 38 > 18 → "\n\n"
    ]
    df = spark.createDataFrame(rows, "doc_id int, page int, idx int, y double, str string")
    text = assemble_pdf_text(df).collect()[0]["text"]
    assert text == "dòng một\ndòng hai\n\nđoạn mới"


def test_same_line_items_join_in_item_order(spark):
    rows = [
        (0, 1, 1, 700.0, "thứ"),
        (0, 1, 0, 700.0, "xếp"),
        (0, 1, 2, 700.0, "tự"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, page int, idx int, y double, str string")
    text = assemble_pdf_text(df).collect()[0]["text"]
    assert text == "xếp thứ tự"
