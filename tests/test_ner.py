"""Golden tests for the NER span algebra — the reference's own unit
suite (`src/lib/ner/nerUtils.test.ts:5-340`) transcribed as behavioral
goldens, plus the Spark applyInPandas surface."""

from __future__ import annotations

from crawler_spark.functions.ner import (
    resolve_overlap_annotations,
    wrap_ner_label,
    wrap_sentences,
)

TEXT = "The quick brown fox jumps over the lazy dog."


def ann(start, end, text, label, sid, stype="single", lang=""):
    return {
        "start": start,
        "end": end,
        "text": text,
        "labels": [label],
        "sentence_id": sid,
        "sentence_type": stype,
        "language_code": lang,
    }


def test_wrap_non_overlapping():
    anns = [
        ann(0, 3, "The", "PER", "RCN_001.001.001.01"),
        ann(4, 9, "quick", "LOC", "RCN_001.001.002.01"),
        ann(10, 15, "brown", "ORG", "RCN_001.001.003.01"),
    ]
    expected = (
        '<PER SENTENCE_ID="RCN_001.001.001.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">The</PER>'
        ' <LOC SENTENCE_ID="RCN_001.001.002.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">quick</LOC>'
        ' <ORG SENTENCE_ID="RCN_001.001.003.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">brown</ORG>'
        " fox jumps over the lazy dog."
    )
    assert wrap_ner_label(TEXT, anns) == expected


def test_wrap_overlapping():
    anns = [
        ann(0, 3, "The", "PER", "RCN_001.001.001.01"),
        ann(4, 19, "quick brown fox", "LOC", "RCN_001.001.002.01"),
        ann(10, 25, "brown fox jumps", "ORG", "RCN_001.001.003.01"),
    ]
    expected = (
        '<PER SENTENCE_ID="RCN_001.001.001.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">The</PER>'
        ' <LOC SENTENCE_ID="RCN_001.001.002.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">quick </LOC>'
        '<ORG SENTENCE_ID="RCN_001.001.003.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">'
        '<LOC SENTENCE_ID="RCN_001.001.002.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">brown fox</LOC>'
        " jumps</ORG> over the lazy dog."
    )
    assert wrap_ner_label(TEXT, anns) == expected


def test_wrap_contained():
    anns = [
        ann(0, 3, "The", "PER", "RCN_001.001.001.01"),
        ann(4, 25, "quick brown fox jumps", "LOC", "RCN_001.001.002.01"),
        ann(10, 19, "brown fox", "ORG", "RCN_001.001.003.01"),
    ]
    expected = (
        '<PER SENTENCE_ID="RCN_001.001.001.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">The</PER>'
        ' <LOC SENTENCE_ID="RCN_001.001.002.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">quick '
        '<ORG SENTENCE_ID="RCN_001.001.003.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">brown fox</ORG>'
        " jumps</LOC> over the lazy dog."
    )
    assert wrap_ner_label(TEXT, anns) == expected


def test_wrap_empty_and_single():
    assert wrap_ner_label(TEXT, []) == TEXT
    got = wrap_ner_label("Hello world", [ann(0, 5, "Hello", "PER", "RCN_001.001.001.01")])
    assert got == (
        '<PER SENTENCE_ID="RCN_001.001.001.01" SENTENCE_TYPE="single" LANGUAGE_CODE="">Hello</PER> world'
    )


def test_resolve_non_overlapping_sorted():
    anns = [
        ann(0, 3, "The", "PER", "RCN_001.001.001.01"),
        ann(4, 9, "quick", "LOC", "RCN_001.001.002.01"),
        ann(10, 15, "brown", "ORG", "RCN_001.001.003.01"),
    ]
    assert resolve_overlap_annotations(anns) == anns


def test_resolve_overlap_keep_right():
    anns = [
        ann(4, 19, "quick brown fox", "LOC", "RCN_001.001.002.01"),
        ann(10, 25, "brown fox jumps", "ORG", "RCN_001.001.003.01"),
    ]
    got = resolve_overlap_annotations(anns, overlap_keep_right=True)
    assert got == [
        ann(4, 10, "quick ", "LOC", "RCN_001.001.002.01"),
        ann(10, 25, "brown fox jumps", "ORG", "RCN_001.001.003.01"),
        ann(10, 19, "brown fox", "LOC", "RCN_001.001.002.01"),
    ]


def test_resolve_contained_untouched():
    anns = [
        ann(4, 25, "quick brown fox jumps", "LOC", "RCN_001.001.002.01"),
        ann(10, 19, "brown fox", "ORG", "RCN_001.001.003.01"),
    ]
    got = resolve_overlap_annotations(anns)
    assert got == sorted(anns, key=lambda a: a["start"])


def test_resolve_empty_and_single():
    assert resolve_overlap_annotations([]) == []
    one = [ann(0, 5, "Hello", "PER", "RCN_001.001.001.01")]
    assert resolve_overlap_annotations(one) == one


def test_wrap_sentences_spark(spark):
    sentences = spark.createDataFrame(
        [("s1", TEXT), ("s2", "No entities here.")],
        "sentence_id string, text string",
    )
    annotations = spark.createDataFrame(
        [
            ("s1", 0, 3, "The", "PER", "single", ""),
            ("s1", 4, 9, "quick", "LOC", "single", ""),
        ],
        "sentence_id string, start int, end int, span_text string, "
        "label string, sentence_type string, language_code string",
    )
    got = {r["sentence_id"]: r["wrapped"] for r in wrap_sentences(sentences, annotations).collect()}
    assert got["s2"] == "No entities here."
    assert got["s1"].startswith(
        '<PER SENTENCE_ID="s1" SENTENCE_TYPE="single" LANGUAGE_CODE="">The</PER>'
    )
    assert '<LOC SENTENCE_ID="s1"' in got["s1"]
