"""Hierarchical dotted ID grammar (the crawl's primary keys).

Reference: ``src/lib/crawler/getId.ts`` — base prefix ``DSG``
(getId.ts:14-27), document ``DSG_fff`` zero-padded 3 (getId.ts:30-38),
chapter ``DSG_fff.ccc`` (getId.ts:41-53), page ``DSG_fff.ccc.ppp``
(getId.ts:56-62), sentence ``DSG_fff.ccc.ppp.ss`` padded 2
(getId.ts:65-69); inverse ``parseId`` via anchored regex
(getId.ts:71-107).

All pure built-in column expressions — no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

PREFIX = "DSG"

_ID_RE = re.compile(
    r"^(?P<prefix>[A-Z]+)_(?P<doc>\d{3})"
    r"(?:\.(?P<chapter>\d{3})(?:\.(?P<page>\d{3})(?:\.(?P<sentence>\d{2}))?)?)?$"
)


def _c(x: Column | str | int) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, int):
        return F.lit(x)
    return F.col(x)


def document_id(num: Column | str | int) -> Column:
    """``DSG_fff`` (getId.ts:30-38)."""
    return F.format_string(f"{PREFIX}_%03d", _c(num))


def chapter_id(doc_num: Column | str | int, ch_num: Column | str | int) -> Column:
    """``DSG_fff.ccc`` (getId.ts:41-53)."""
    return F.format_string(f"{PREFIX}_%03d.%03d", _c(doc_num), _c(ch_num))


def page_id(doc_num, ch_num, pg_num) -> Column:
    """``DSG_fff.ccc.ppp`` (getId.ts:56-62)."""
    return F.format_string(f"{PREFIX}_%03d.%03d.%03d", _c(doc_num), _c(ch_num), _c(pg_num))


def sentence_id(doc_num, ch_num, pg_num, st_num) -> Column:
    """``DSG_fff.ccc.ppp.ss`` (getId.ts:65-69)."""
    return F.format_string(
        f"{PREFIX}_%03d.%03d.%03d.%02d", _c(doc_num), _c(ch_num), _c(pg_num), _c(st_num)
    )


def parse_id_cols(id_col: Column | str) -> dict[str, Column]:
    """Inverse of the formatters (getId.ts:71-107) via regexp_extract.

    Returns columns {doc, chapter, page, sentence, level}; absent
    components are null. ``level`` ∈ {document, chapter, page, sentence}.
    """
    c = _c(id_col)
    pat = r"^[A-Z]+_(\d{3})(?:\.(\d{3})(?:\.(\d{3})(?:\.(\d{2}))?)?)?$"
    doc = F.nullif(F.regexp_extract(c, pat, 1), F.lit("")).cast("int")
    ch = F.nullif(F.regexp_extract(c, pat, 2), F.lit("")).cast("int")
    pg = F.nullif(F.regexp_extract(c, pat, 3), F.lit("")).cast("int")
    st = F.nullif(F.regexp_extract(c, pat, 4), F.lit("")).cast("int")
    level = (
        F.when(st.isNotNull(), F.lit("sentence"))
        .when(pg.isNotNull(), F.lit("page"))
        .when(ch.isNotNull(), F.lit("chapter"))
        .when(doc.isNotNull(), F.lit("document"))
        .otherwise(F.lit(None).cast("string"))
    )
    return {"doc": doc, "chapter": ch, "page": pg, "sentence": st, "level": level}


def parse_id(s: str) -> dict | None:
    """Python mirror of :func:`parse_id_cols` for the oracle."""
    m = _ID_RE.match(s)
    if not m:
        return None
    g = m.groupdict()
    out = {
        "doc": int(g["doc"]),
        "chapter": int(g["chapter"]) if g["chapter"] else None,
        "page": int(g["page"]) if g["page"] else None,
        "sentence": int(g["sentence"]) if g["sentence"] else None,
    }
    if out["sentence"] is not None:
        out["level"] = "sentence"
    elif out["page"] is not None:
        out["level"] = "page"
    elif out["chapter"] is not None:
        out["level"] = "chapter"
    else:
        out["level"] = "document"
    return out
