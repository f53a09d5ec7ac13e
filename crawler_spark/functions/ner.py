"""NER span algebra (SURVEY C24/C25) — overlap resolution + tag wrapping.

Semantics re-expressed from the reference's only unit-tested module
(`src/lib/ner/nerUtils.ts:28-189`, goldens `nerUtils.test.ts`):

  * overlap resolution walks spans right-to-left; a *contained* span is
    left intact; a *partial* overlap splits the left span at the right
    span's boundary, emitting the overlapping segment as an extra span
    (keep-right policy; keep-left mirrors it);
  * wrapping splices ``<LABEL SENTENCE_ID=... SENTENCE_TYPE=...
    LANGUAGE_CODE=...>`` tags right-to-left, longer-first on start
    ties, with offset fixups so nested spans account for tags already
    inserted by enclosing/enclosed spans.

Annotations are plain dicts: {start, end, text, labels, sentence_id,
sentence_type, language_code}. The Spark surface is
:func:`wrap_ner_udf` — an ``applyInPandas`` kernel over sentence
groups (one group = one sentence + its annotation rows), vectorized at
the batch boundary per the no-per-row-Python rule.
"""

from __future__ import annotations

import pandas as pd


def _ann(a: dict, **over) -> dict:
    out = dict(a)
    out.update(over)
    return out


def resolve_overlap_annotations(
    annotations: list[dict], overlap_keep_right: bool = True
) -> list[dict]:
    """Split partially-overlapping spans so the survivors nest cleanly.

    Walks spans in descending-start order comparing each to its right
    neighbor; containment passes through, partial overlap splits the
    leftward span at the boundary and emits the overlap segment as an
    additional span (`nerUtils.ts:28-116` behavior, including which
    side keeps the overlap under each policy).
    """
    if len(annotations) <= 1:
        return list(annotations)

    spans = sorted(annotations, key=lambda a: -a["start"])
    extra: list[dict] = []

    for i in range(1, len(spans)):
        cur, prev = spans[i], spans[i - 1]
        if prev["start"] >= cur["end"]:
            continue  # disjoint
        if (
            prev["start"] >= cur["start"]
            and prev["end"] <= cur["end"]
            and prev["start"] < cur["end"]
        ):
            continue  # contained — left intact
        if prev["start"] < cur["end"] and prev["end"] > cur["start"]:
            if overlap_keep_right:
                cut = prev["start"] - cur["start"]
                extra.append(
                    _ann(cur, start=prev["start"], text=cur["text"][cut:])
                )
                spans[i] = _ann(cur, end=prev["start"], text=cur["text"][:cut])
            else:
                cut = cur["end"] - prev["start"]
                extra.append(_ann(prev, end=cur["end"], text=prev["text"][:cut]))
                spans[i - 1] = _ann(
                    prev, start=cur["end"], text=prev["text"][cut:]
                )

    return sorted(spans + extra, key=lambda a: a["start"])


def _tags(a: dict) -> tuple[str, str]:
    label = a["labels"][0]
    opening = (
        f'<{label} SENTENCE_ID="{a["sentence_id"]}" '
        f'SENTENCE_TYPE="{a["sentence_type"]}" '
        f'LANGUAGE_CODE="{a["language_code"]}">'
    )
    return opening, f"</{label}>"


def wrap_ner_label(text: str, annotations: list[dict]) -> str:
    """Splice XML-ish entity tags into ``text`` (`nerUtils.ts:118-189`
    behavior: resolve overlaps keep-right, splice right-to-left with
    longer-span-first tie order and nesting offset fixups)."""
    if not annotations:
        return text

    resolved = resolve_overlap_annotations(annotations, overlap_keep_right=True)
    ordered = sorted(
        resolved, key=lambda a: (-a["start"], -(a["end"] - a["start"]))
    )
    tagged = []
    for a in ordered:
        opening, closing = _tags(a)
        tagged.append(
            {**a, "opening": opening, "closing": closing}
        )

    for i, cur in enumerate(tagged):
        for j in range(i + 1, len(tagged)):
            nxt = tagged[j]
            if (
                nxt["start"] >= cur["start"]
                and nxt["end"] <= cur["end"]
                and nxt["start"] < cur["end"]
            ):
                # nxt nested inside cur → shift past cur's opening tag
                nxt["start"] += len(cur["opening"])
                nxt["end"] += len(cur["opening"])
            elif (
                nxt["start"] <= cur["start"]
                and nxt["end"] >= cur["end"]
                and nxt["start"] < cur["end"]
            ):
                # nxt encloses cur → its close must move past both tags
                nxt["end"] += len(cur["opening"]) + len(cur["closing"])

    result = text
    for a in tagged:
        result = (
            result[: a["start"]]
            + a["opening"]
            + result[a["start"] : a["end"]]
            + a["closing"]
            + result[a["end"] :]
        )
    return result


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

WRAPPED_SCHEMA = "sentence_id string, wrapped string"


def wrap_ner_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one group = one sentence. Expects columns
    (sentence_id, text, start, end, span_text, label, sentence_type,
    language_code); rows with null start carry sentences that have no
    annotations."""
    sid = pdf["sentence_id"].iloc[0]
    text = pdf["text"].iloc[0]
    anns = [
        {
            "start": int(r.start),
            "end": int(r.end),
            "text": r.span_text,
            "labels": [r.label],
            "sentence_id": r.sentence_id,
            "sentence_type": r.sentence_type,
            "language_code": r.language_code if r.language_code is not None else "",
        }
        for r in pdf.itertuples()
        if pd.notna(r.start)
    ]
    return pd.DataFrame({"sentence_id": [sid], "wrapped": [wrap_ner_label(text, anns)]})


def wrap_sentences(sentences, annotations):
    """sentences(sentence_id, text) ⟕ annotations(sentence_id, start,
    end, span_text, label, sentence_type, language_code) → wrapped
    text per sentence (J5 join + C25 kernel)."""
    j = sentences.join(annotations, "sentence_id", "left")
    return j.groupBy("sentence_id").applyInPandas(wrap_ner_batch, WRAPPED_SCHEMA)
