"""K8 Label-Studio task export/import round trip.

The reference loop is extract-ner-task.ts (corpus → task files) →
Label Studio → export-ner-task.ts (snapshot → merged task files) →
inject-annotation.ts (tasks → wrapped corpus). Here: build → to_json
chapter files → from_json import → flatten → C25 tag wrap, asserting
(a) the task JSON value matches the reference shape (annotations key
omitted when empty, from_name/to_name/type constants, camelCase data
keys), (b) import ∘ export is the identity on annotation rows, (c) the
injected output equals the nerUtils golden wrapping, and (d) the
snapshot merge replaces-by-sentenceId / appends-new.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from crawler_spark.functions.ner import wrap_ner_label, wrap_sentences
from crawler_spark.functions.ner_tasks import (
    export_ner_task_files,
    import_ner_task_files,
    merge_ner_tasks,
    task_annotations,
)

TEXT = "The quick brown fox jumps over the lazy dog."

SENT_SCHEMA = (
    "sentence_id string, chapter_id string, document_id string, text string, "
    "sentence_type string, language_code string, title string, genre_code string"
)
ANN_SCHEMA = "sentence_id string, start int, end int, span_text string, label string"


def _fixtures(spark):
    sentences = spark.createDataFrame(
        [
            ("DSG_001.001.001.01", "DSG_001.001", "DSG_001", TEXT, "single", "", "Sách Một", "N"),
            ("DSG_001.001.001.02", "DSG_001.001", "DSG_001", "No entities here.", "single", "", "Sách Một", "N"),
            ("DSG_001.001.002.01", "DSG_001.001", "DSG_001", "Hello world", "single", "V", "Sách Một", "N"),
        ],
        SENT_SCHEMA,
    )
    annotations = spark.createDataFrame(
        [
            ("DSG_001.001.001.01", 0, 3, "The", "PER"),
            ("DSG_001.001.001.01", 4, 9, "quick", "LOC"),
            ("DSG_001.001.001.01", 10, 15, "brown", "ORG"),
            ("DSG_001.001.002.01", 0, 5, "Hello", "PER"),
        ],
        ANN_SCHEMA,
    )
    return sentences, annotations


def test_export_task_file_shape(spark):
    sentences, annotations = _fixtures(spark)
    files = export_ner_task_files(sentences, annotations).collect()
    assert len(files) == 1
    row = files[0]
    assert (row["genre_code"], row["chapter_id"]) == ("N", "DSG_001.001")
    tasks = json.loads(row["task_json"])
    assert [t["data"]["sentenceId"] for t in tasks] == [
        "DSG_001.001.001.01",
        "DSG_001.001.001.02",
        "DSG_001.001.002.01",
    ]
    t0 = tasks[0]
    assert set(t0["data"]) == {
        "text", "documentId", "chapterId", "sentenceId",
        "sentenceType", "languageCode", "title", "genreCode",
    }
    r0 = t0["annotations"][0]["result"]
    assert [r["value"]["start"] for r in r0] == [0, 4, 10]
    assert r0[0] == {
        "value": {"start": 0, "end": 3, "text": "The", "labels": ["PER"]},
        "from_name": "label",
        "to_name": "text",
        "type": "labels",
    }
    # ground-truth rule: no annotations key for unannotated sentences
    assert "annotations" not in tasks[1]
    assert tasks[2]["data"]["languageCode"] == "V"


def test_import_export_roundtrip_and_inject(spark):
    sentences, annotations = _fixtures(spark)
    files = export_ner_task_files(sentences, annotations)
    imported = import_ner_task_files(files)
    assert imported.count() == 3

    flat = task_annotations(imported)
    got = sorted(
        (r["sentence_id"], r["start"], r["end"], r["span_text"], r["labels"][0])
        for r in flat.collect()
    )
    want = sorted(
        (r["sentence_id"], r["start"], r["end"], r["span_text"], r["label"])
        for r in annotations.collect()
    )
    assert got == want

    # inject: wrap with the imported annotations == python golden wrap
    wrapped = {
        r["sentence_id"]: r["wrapped"]
        for r in wrap_sentences(
            sentences.select("sentence_id", "text"),
            flat.select(
                "sentence_id", "start", "end", "span_text",
                F.col("labels")[0].alias("label"),
                "sentence_type", "language_code",
            ),
        ).collect()
    }
    sid = "DSG_001.001.001.01"
    anns = [
        {"start": s, "end": e, "text": t, "labels": [lb], "sentence_id": sid,
         "sentence_type": "single", "language_code": ""}
        for (s, e, t, lb) in [(0, 3, "The", "PER"), (4, 9, "quick", "LOC"), (10, 15, "brown", "ORG")]
    ]
    assert wrapped[sid] == wrap_ner_label(TEXT, anns)
    assert wrapped["DSG_001.001.001.02"] == "No entities here."


def test_import_drops_corrupt_and_invalid(spark):
    sentences, annotations = _fixtures(spark)
    good = export_ner_task_files(sentences, annotations)
    corrupt = spark.createDataFrame(
        [("N", "DSG_001.002", "{not json]")],
        "genre_code string, chapter_id string, task_json string",
    )
    bad_values = spark.createDataFrame(
        [(
            "N",
            "DSG_001.003",
            json.dumps([{
                "data": {"text": "x", "documentId": "d", "chapterId": "DSG_001.003",
                          "sentenceId": "DSG_001.003.001.01", "sentenceType": "single",
                          "languageCode": "", "title": "t", "genreCode": "N"},
                "annotations": [{"result": [
                    {"value": {"start": -1, "end": 3, "text": "bad", "labels": ["PER"]},
                     "from_name": "label", "to_name": "text", "type": "labels"},
                    {"value": {"start": 0, "end": 3, "text": "bad2", "labels": ["NOPE"]},
                     "from_name": "label", "to_name": "text", "type": "labels"},
                ]}],
            }]),
        )],
        "genre_code string, chapter_id string, task_json string",
    )
    imported = import_ner_task_files(good.unionByName(corrupt).unionByName(bad_values))
    # corrupt file dropped entirely; bad-value task imports but its
    # invalid annotation values are filtered
    assert imported.filter(F.col("chapter_id") == "DSG_001.002").count() == 0
    assert imported.filter(F.col("chapter_id") == "DSG_001.003").count() == 1
    flat = task_annotations(imported)
    assert flat.filter(F.col("sentence_id") == "DSG_001.003.001.01").count() == 0
    assert flat.count() == 4


def test_snapshot_merge_replaces_and_appends(spark):
    sentences, annotations = _fixtures(spark)
    existing = import_ner_task_files(export_ner_task_files(sentences, annotations))

    new_sentence = spark.createDataFrame(
        [("DSG_001.001.003.01", "DSG_001.001", "DSG_001", "Brand new.", "single", "", "Sách Một", "N")],
        SENT_SCHEMA,
    )
    upd_annotations = spark.createDataFrame(
        [
            # replaces the 3 spans of ...001.01 with a single span
            ("DSG_001.001.001.01", 16, 19, "fox", "TME"),
            ("DSG_001.001.003.01", 0, 5, "Brand", "NUM"),
        ],
        ANN_SCHEMA,
    )
    upd_sentences = sentences.filter(
        F.col("sentence_id") == "DSG_001.001.001.01"
    ).unionByName(new_sentence)
    incoming = import_ner_task_files(export_ner_task_files(upd_sentences, upd_annotations))

    merged = merge_ner_tasks(existing, incoming)
    assert merged.count() == 4  # 3 existing + 1 appended
    flat = task_annotations(merged)
    by_sid = {}
    for r in flat.collect():
        by_sid.setdefault(r["sentence_id"], []).append(
            (r["start"], r["end"], r["span_text"], r["labels"][0])
        )
    assert by_sid["DSG_001.001.001.01"] == [(16, 19, "fox", "TME")]  # replaced
    assert by_sid["DSG_001.001.002.01"] == [(0, 5, "Hello", "PER")]  # untouched
    assert by_sid["DSG_001.001.003.01"] == [(0, 5, "Brand", "NUM")]  # appended
