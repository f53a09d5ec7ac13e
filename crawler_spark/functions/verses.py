r"""C22 verse-number ops + O9 exact verse-order tracking.

Reference: ``src/sites/augustino.net/getPageContentDaily.ts:26-110`` —
chapters arrive as cleaned markdown where verse numbers are wrapped in
``$…$`` tokens (``$4$``, ``$4a$``, ``$ $``, ``$3-4$``; unicode letters
allowed after digits). Semantics reproduced exactly, as verified by
node-executed goldens (tests/test_verses.py):

  * hard line-break normalize: a ``\\`` at end of line becomes ``\n``
    (``:51`` ``replaceAll(/\\$/gmu, '\n')``);
  * paragraph split on ``\n`` NOT preceded by ``&&`` or ``&&\n``
    (heading lines are glued with ``&&`` — ``:53``), drop blank;
  * verse split BEFORE each verse token (zero-width lookahead,
    ``:72``); a token at position 0 does not create a leading empty
    verse (JS ``String.split`` zero-progress rule);
  * running order track (``:63-96``): ``number`` starts at 0; a verse
    token's number is ``parseInt`` of its first group (``$3-4$`` → 3,
    ``$ $``/no token → NaN → inherit current number); on number change
    ``sub_verse_index`` resets to 0, otherwise it increments — note the
    quirk that the FIRST verse of a chapter with no/blank token
    *increments* from the initial (0, 0) state to (0, 1);
  * verse text: all verse tokens removed, trimmed, then the site
    footnote regex (``footnoteUtils.ts:5`` ``\\?\\?\[[a-zA-Z0-9@]+\]``)
    removed, trimmed again;
  * ``label`` = the matched token without ``$`` (``' '`` for blank),
    ``''`` when the verse has no token;
  * paragraph_number / paragraph_index are 0-based (``:104-105``).

The per-chapter state is inherently sequential, so the Spark operator
is a vectorized pandas UDF producing the verse array per chapter row
(one chapter = one input row → no shuffle at all; parallelism comes
from chapter-level partitioning, which is exactly how a 100 TB corpus
splits). JS ``\p{L}`` maps to python's ``[^\W\d_]`` (unicode letters)
and survives byte-parity against the node goldens.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# $<digits><letters?>$ | $ $ , optional -<digits><letters?> suffix
_VERSE_RE = re.compile(r"\$(\d+[^\W\d_]*| )(-\d+[^\W\d_]*)?\$")
_HARD_BREAK_RE = re.compile(r"\\$", re.M)
# (?<!&&\n?) is variable-width (JS allows it; python re does not) —
# equivalent conjunction of two fixed-width lookbehinds
_PARA_SPLIT_RE = re.compile(r"(?<!&&)(?<!&&\n)\n")
_VERSE_SPLIT_RE = re.compile(r"(?=\$(?:\d+[^\W\d_]*| )(?:-\d+[^\W\d_]*)?\$)")
_SITE_FOOTNOTE_RE = re.compile(r"\\?\\?\[([a-zA-Z0-9@]+)\]")


def split_chapter_verses(md: str) -> list[dict]:
    """Python mirror (used by the oracle and inside the Spark UDF)."""
    flat = _HARD_BREAK_RE.sub("\n", md)
    paragraphs = [p for p in _PARA_SPLIT_RE.split(flat) if p.strip()]
    out: list[dict] = []
    number, sub = 0, 0
    for p_idx, para in enumerate(paragraphs):
        verses = _VERSE_SPLIT_RE.split(para)
        if verses and verses[0] == "":
            # JS split: a zero-width match at position 0 makes no cut
            verses = verses[1:]
        for v_idx, verse in enumerate(verses):
            m = _VERSE_RE.search(verse)
            num = None
            if m:
                dm = re.match(r"\d+", m.group(1))
                num = int(dm.group()) if dm else None
            cur = number if num is None else num
            if cur != number:
                number, sub = cur, 0
            else:
                sub += 1
            content = _VERSE_RE.sub("", verse).strip()
            out.append(
                {
                    "text": _SITE_FOOTNOTE_RE.sub("", content).strip(),
                    "number": number,
                    "sub_verse_index": sub,
                    "paragraph_number": p_idx,
                    "paragraph_index": v_idx,
                    "label": m.group(0).replace("$", "") if m else "",
                }
            )
    return out


VERSE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType(), False),
            T.StructField("number", T.IntegerType(), False),
            T.StructField("sub_verse_index", T.IntegerType(), False),
            T.StructField("paragraph_number", T.IntegerType(), False),
            T.StructField("paragraph_index", T.IntegerType(), False),
            T.StructField("label", T.StringType(), False),
        ]
    )
)


def verses_col(text: Column | str) -> Column:
    """Array<struct> of tracked verses per chapter row (Arrow-batched)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(VERSE_SCHEMA)
    def _split(s):
        return s.map(lambda t: split_chapter_verses(t) if t is not None else [])

    c = F.col(text) if isinstance(text, str) else text
    return _split(c)


def chapter_verses(df: DataFrame, text_col: str, *key_cols: str) -> DataFrame:
    """One output row per verse, keyed by ``key_cols`` — the flattened
    sentences table the reference builds per chapter
    (``getPageContentDaily.ts:98-110``)."""
    return df.select(*key_cols, F.inline(verses_col(text_col)))
