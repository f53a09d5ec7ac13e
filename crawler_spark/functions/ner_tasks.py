"""K8 — Label-Studio NER task export / import round trip.

Re-expresses the reference's annotation loop as DataFrame ops:

  * task build (``src/lib/ner/schemaMapping.ts:4-84``
    ``mapTreeToNerData`` + ``src/ner-processing/extract-ner-task.ts:
    12-53``): one Label-Studio task per sentence —
    ``{data: {text, documentId, chapterId, sentenceId, sentenceType,
    languageCode, title, genreCode}, annotations: [{result: [{value:
    {start, end, text, labels}, from_name: 'label', to_name: 'text',
    type: 'labels'}]}]}`` with the ``annotations`` key OMITTED when the
    sentence has none (the reference's ground-truth note) — Spark's
    ``to_json`` drops null fields, giving the same JSON value;
  * chapter task files: tasks grouped per (genreCode, chapterId) into
    one JSON array, ordered by sentenceId (the zero-padded DSG grammar
    makes lexicographic == document order);
  * import (``import-ner-task.ts:46-68`` + the zod ``NerDataSchema``
    drop-and-log contract): parse task JSON, drop corrupt entries and
    annotation values that fail the schema (start/end ≥ 0, labels ⊆
    the entity enum ``src/lib/ner/mapping.ts:3-28``), flatten to
    SentenceEntityAnnotation rows;
  * snapshot merge (``export-ner-task.ts:95-120``): incoming tasks
    replace the annotations of an existing task with the same
    ``data.sentenceId`` and append otherwise.

File-format note: the reference pretty-prints with 2-space indent;
this module emits compact JSON of the SAME value — parity is defined
at the JSON-value level (import ∘ export == identity), which is what
the round-trip tests assert, ending in the C25 tag-wrap goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENTITY_LABELS = ["PER", "LOC", "ORG", "TITLE", "TME", "NUM"]

_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.IntegerType(), True),
        T.StructField("end", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
    ]
)
_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("value", _VALUE_SCHEMA, True),
        T.StructField("from_name", T.StringType(), True),
        T.StructField("to_name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
    ]
)
_DATA_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("documentId", T.StringType(), True),
        T.StructField("chapterId", T.StringType(), True),
        T.StructField("sentenceId", T.StringType(), True),
        T.StructField("sentenceType", T.StringType(), True),
        T.StructField("languageCode", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("genreCode", T.StringType(), True),
    ]
)
TASK_SCHEMA = T.StructType(
    [
        T.StructField(
            "annotations",
            T.ArrayType(
                T.StructType([T.StructField("result", T.ArrayType(_RESULT_SCHEMA), True)])
            ),
            True,
        ),
        T.StructField("data", _DATA_SCHEMA, True),
    ]
)


def build_ner_tasks(sentences: DataFrame, annotations: DataFrame) -> DataFrame:
    """sentences(sentence_id, chapter_id, document_id, text,
    sentence_type, language_code, title, genre_code) ⟕
    annotations(sentence_id, start, end, span_text, label) → one task
    row per sentence: (genre_code, chapter_id, sentence_id, task).

    The annotation join is per-sentence 1:N with result order (start,
    end, label) — deterministic under parallelism (the reference keeps
    its in-memory array order, which is the same document order)."""
    results = (
        annotations.groupBy("sentence_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.struct(
                            F.col("start").cast("int").alias("start"),
                            F.col("end").cast("int").alias("end"),
                            F.col("span_text").alias("text"),
                            F.array(F.col("label")).alias("labels"),
                        ).alias("value"),
                        F.lit("label").alias("from_name"),
                        F.lit("text").alias("to_name"),
                        F.lit("labels").alias("type"),
                    )
                )
            ).alias("result")
        )
    )
    j = sentences.join(results, "sentence_id", "left")
    task = F.struct(
        F.when(
            F.col("result").isNotNull() & (F.size("result") > 0),
            F.array(F.struct(F.col("result").alias("result"))),
        ).alias("annotations"),
        F.struct(
            F.col("text").alias("text"),
            F.col("document_id").alias("documentId"),
            F.col("chapter_id").alias("chapterId"),
            F.col("sentence_id").alias("sentenceId"),
            F.col("sentence_type").alias("sentenceType"),
            F.coalesce(F.col("language_code"), F.lit("")).alias("languageCode"),
            F.col("title").alias("title"),
            F.col("genre_code").alias("genreCode"),
        ).alias("data"),
    )
    return j.select("genre_code", "chapter_id", "sentence_id", task.alias("task"))


def export_ner_task_files(sentences: DataFrame, annotations: DataFrame) -> DataFrame:
    """One row per chapter task file: (genre_code, chapter_id,
    task_json) — the `DEFAULT_TASK_DIR/<genre>/<chapterId>.json` layout
    as a table (the write path is a partitioned text sink)."""
    tasks = build_ner_tasks(sentences, annotations)
    return (
        tasks.groupBy("genre_code", "chapter_id")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("sentence_id").alias("k"), F.col("task").alias("t")))
                    ),
                    lambda s: s["t"],
                )
            ).alias("task_json")
        )
    )


def import_ner_task_files(task_files: DataFrame) -> DataFrame:
    """task_files(genre_code, chapter_id, task_json) → task rows.
    Corrupt JSON parses to null and is dropped (the zod safeParse
    drop-and-log contract; route ``_corrupt`` to a quarantine sink in
    the engine)."""
    parsed = task_files.select(
        "genre_code",
        "chapter_id",
        F.from_json(F.col("task_json"), T.ArrayType(TASK_SCHEMA)).alias("tasks"),
    )
    return (
        parsed.filter(F.col("tasks").isNotNull())
        .select("genre_code", "chapter_id", F.explode("tasks").alias("task"))
        .select(
            "genre_code",
            "chapter_id",
            F.col("task.data.sentenceId").alias("sentence_id"),
            F.col("task"),
        )
    )


def task_annotations(tasks: DataFrame) -> DataFrame:
    """Flatten imported tasks to SentenceEntityAnnotation rows
    (``src/lib/ner/schema.ts:70-80``), applying the schema's validity
    predicate (start/end ≥ 0 after int coercion, labels within the
    entity enum) as a filter — invalid values drop like zod rows."""
    r = (
        tasks.filter(F.col("task.annotations").isNotNull())
        .select(
            "sentence_id",
            F.col("task.data.sentenceType").alias("sentence_type"),
            F.col("task.data.languageCode").alias("language_code"),
            F.explode(F.col("task.annotations")[0]["result"]).alias("res"),
        )
        .select(
            "sentence_id",
            "sentence_type",
            "language_code",
            F.col("res.value.start").alias("start"),
            F.col("res.value.end").alias("end"),
            F.col("res.value.text").alias("span_text"),
            F.col("res.value.labels").alias("labels"),
        )
    )
    valid_labels = F.array(*[F.lit(x) for x in ENTITY_LABELS])
    return r.filter(
        (F.col("start") >= 0)
        & (F.col("end") >= 0)
        & (F.size(F.array_except(F.col("labels"), valid_labels)) == 0)
    )


def merge_ner_tasks(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Snapshot merge (``export-ner-task.ts:95-120``): per
    (chapter_id, sentence_id), an incoming task replaces the stored
    task's annotations; unseen sentence_ids append. Both inputs are
    task rows from :func:`import_ner_task_files` /
    :func:`build_ner_tasks`."""
    inc = incoming.select(
        "genre_code",
        "chapter_id",
        "sentence_id",
        F.col("task").alias("_inc_task"),
    )
    j = existing.join(inc, ["genre_code", "chapter_id", "sentence_id"], "full_outer")
    merged = j.select(
        "genre_code",
        "chapter_id",
        "sentence_id",
        F.when(
            F.col("_inc_task").isNotNull() & F.col("task").isNotNull(),
            # update path: keep stored data, take incoming annotations
            F.struct(
                F.col("_inc_task.annotations").alias("annotations"),
                F.col("task.data").alias("data"),
            ),
        )
        .otherwise(F.coalesce(F.col("_inc_task"), F.col("task")))
        .alias("task"),
    )
    return merged
