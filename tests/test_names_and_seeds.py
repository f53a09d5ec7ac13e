"""C23 proper-name extraction (Column↔Python parity + the J7
positional verification join) and F10 flat→nested seed mapping."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.text import (
    extract_names_from_footnote,
    find_name_matches,
    names_from_footnote_col,
)
from crawler_spark.sources.seeds import to_nested_metadata

FOOTNOTE_CASES = [
    "Hl: Phêrô | La: Petrus",
    "Hl: Phêrô 12 (ghi chú) | nothing here",
    "no colon section",
    "Hl: Môsê -- một tiên tri | La: Moses",
    "a: | b:  ",
    "x: Đa-vít (vua) 3",
    "",
    "first: A : B | second: C",
]


def test_names_column_python_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FOOTNOTE_CASES)], "i int, s string"
    )
    rows = df.select("i", "s", names_from_footnote_col(F.col("s")).alias("names")).collect()
    for r in rows:
        assert list(r["names"]) == extract_names_from_footnote(r["s"]), (
            r["i"],
            r["s"],
        )


def test_names_semantics():
    assert extract_names_from_footnote("Hl: Phêrô | La: Petrus") == ["Phêrô", "Petrus"]
    assert extract_names_from_footnote("Hl: Môsê -- nt | x: A1(b)") == ["Môsê", "A"]
    # .at(1): only the piece between the first and second colon
    assert extract_names_from_footnote("first: A : B") == ["A"]


def test_find_name_matches_positional_verification(spark):
    text = "Ông Phêrô nói với Môsê."
    #       0123456789...
    end_pherou = text.find("Phêrô") + len("Phêrô")
    end_mose = text.find("Môsê") + len("Môsê")
    sentences = spark.createDataFrame([("s1", text)], "sentence_id string, text string")
    footnotes = spark.createDataFrame(
        [
            ("s1", "Hl: Phêrô", end_pherou),        # verifies
            ("s1", "Hl: Môsê", end_mose),           # verifies
            ("s1", "Hl: Giuse", end_pherou),        # wrong name → dropped
            ("s1", "Hl: Phêrô", 3),                 # wrong position → dropped
        ],
        "sentence_id string, fn_text string, position int",
    )
    got = [
        (r["name"], r["start"], r["end"])
        for r in find_name_matches(sentences, footnotes).collect()
    ]
    assert got == [
        ("Phêrô", end_pherou - len("Phêrô"), end_pherou),
        ("Môsê", end_mose - len("Môsê"), end_mose),
    ]


def test_to_nested_metadata(spark, fixture_dir):
    from crawler_spark.sources.fixtures_io import read_table

    seeds = read_table(spark, fixture_dir, "seeds")
    nested = to_nested_metadata(seeds)
    row = nested.filter(F.col("document_id") == "DSG_001").first()
    assert row["genre"]["code"] in "ACDNZ"
    cats = [t["category"] for t in row["tags"]]
    assert cats == ["t1", "t2"]
    viets = [t["vietnamese"] for t in row["tags"]]
    assert viets == ["thể loại một", "thể loại hai"]
    # unknown category → '' (reference default)
    unk = spark.createDataFrame(
        [("D1", 1, "t", "A", "B", "mystery", "a", "web", "u", "s", False, "2021", "v", False)],
        "document_id string, document_number int, title string, genre_code string, "
        "genre_category string, tag_category string, author string, source_type string, "
        "source_url string, source string, has_chapters boolean, published_time string, "
        "language string, requires_manual_check boolean",
    )
    r = to_nested_metadata(unk).first()
    assert [t["vietnamese"] for t in r["tags"]] == [""]
