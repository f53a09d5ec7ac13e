"""Markdown / text normalization functions (SURVEY §2.9 C1-C15).

The reference's scalar workhorse is an ordered reduce of pure
string→string cleanups (``cleanupMdProcessor``,
``src/lib/md/mdUtils.ts:238-243``). Each function here is implemented
twice with identical semantics:

  * ``*_col``   — Spark Column expression (regexp_replace/translate
                  chains; JVM-side, no UDF) — the engine hot path;
  * plain def   — pure-Python mirror used by the sequential oracle.

Parity between the two is tested (tests/test_text_functions.py).

The single most important graft change: ``removeMdImgs``
(``mdUtils.ts:5,23-44``) *dropped* images; the graft **extracts** them —
:func:`md_images_col` / :func:`extract_md_images` return (caption, link)
pairs per the named groups ``alt``/``link`` of ``reMdImg``
(``mdUtils.ts:5``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def ws_trim_col(c: Column) -> Column:
    """Full-whitespace trim (Python ``str.strip`` twin). Spark's
    ``trim`` strips only ASCII spaces — not newlines/tabs."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")

# ---------------------------------------------------------------------------
# Image extraction / removal (C1 — reMdImg `mdUtils.ts:5`, removeMdImgs :23-44)
# ---------------------------------------------------------------------------

# reference regex: !\[(?<alt>[^\]]*)\]\((?<link>[^)]*)\)
MD_IMG_RE = re.compile(r"!\[(?P<alt>[^\]]*)\]\((?P<link>[^)]*)\)")
_MD_IMG_PAT = r"!\[([^\]]*)\]\(([^)]*)\)"


def extract_md_images(text: str) -> list[tuple[str, str]]:
    """All (caption, link) pairs in document order (oracle mirror)."""
    return [(m.group("alt"), m.group("link")) for m in MD_IMG_RE.finditer(text)]


def md_images_col(text: Column | str) -> Column:
    """Array<struct<caption,link>> of markdown images, document order.

    Pure built-ins: two regexp_extract_all passes zipped positionally.
    """
    c = F.col(text) if isinstance(text, str) else text
    caps = F.regexp_extract_all(c, F.lit(_MD_IMG_PAT), F.lit(1))
    links = F.regexp_extract_all(c, F.lit(_MD_IMG_PAT), F.lit(2))
    return F.zip_with(
        caps, links, lambda a, b: F.struct(a.alias("caption"), b.alias("link"))
    )


def remove_md_imgs(text: str, keep_alt: bool = False) -> str:
    """removeMdImgs (`mdUtils.ts:23-44`): strip ``![alt](link)``;
    keep_alt replaces with the alt text."""
    return MD_IMG_RE.sub((lambda m: m.group("alt")) if keep_alt else "", text)


def remove_md_imgs_col(text: Column | str, keep_alt: bool = False) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _MD_IMG_PAT, "$1" if keep_alt else "")


# ---------------------------------------------------------------------------
# C2 removeMdLinks (`mdUtils.ts:46-63`): [alt](link) → alt
# ---------------------------------------------------------------------------

# negative lookbehind so image syntax is untouched (reference strips images
# first; the lookbehind makes the op order-independent as well)
_MD_LINK_PAT = r"(?<!!)\[([^\]]*)\]\(([^)]*)\)"


def remove_md_links(text: str, use_link: bool = False) -> str:
    return re.sub(_MD_LINK_PAT, (r"\2" if use_link else r"\1"), text)


def remove_md_links_col(text: Column | str, use_link: bool = False) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _MD_LINK_PAT, "$2" if use_link else "$1")


# ---------------------------------------------------------------------------
# C3 removeMdHr (`mdUtils.ts:65-67`)
# ---------------------------------------------------------------------------

_MD_HR_PAT = r"(?m)^[ \t]*(-{3,}|\*{3,}|_{3,})[ \t]*$"


def remove_md_hr(text: str) -> str:
    return re.sub(_MD_HR_PAT, "", text)


def remove_md_hr_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _MD_HR_PAT, "")


# ---------------------------------------------------------------------------
# C6 normalizeQuotes (`mdUtils.ts:112-133`): smart quotes → ascii
# ---------------------------------------------------------------------------

_DQUOTES = "“”„‟″‶"  # “ ” „ ‟ ″ ‶
_SQUOTES = "‘’‚‛′‵"  # ‘ ’ ‚ ‛ ′ ‵


def normalize_quotes(text: str) -> str:
    tbl = {ord(ch): '"' for ch in _DQUOTES}
    tbl.update({ord(ch): "'" for ch in _SQUOTES})
    return text.translate(tbl)


def normalize_quotes_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.translate(c, _DQUOTES + _SQUOTES, '"' * 6 + "'" * 6)


# ---------------------------------------------------------------------------
# C7 normalizeWhitespace (`mdUtils.ts:135-156`): unicode spaces → ' ',
# zero-widths removed
# ---------------------------------------------------------------------------

_UNI_SPACES = (
    "\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u202f\u205f\u3000"
)
_ZERO_WIDTHS = "\u200b\u200c\u200d\u2060\ufeff"


def normalize_whitespace(text: str) -> str:
    tbl = {ord(ch): " " for ch in _UNI_SPACES}
    tbl.update({ord(ch): None for ch in _ZERO_WIDTHS})
    return text.translate(tbl)


def normalize_whitespace_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    c = F.translate(c, _UNI_SPACES, " " * len(_UNI_SPACES))
    return F.regexp_replace(c, f"[{_ZERO_WIDTHS}]", "")


# ---------------------------------------------------------------------------
# C8 normalizeNumberBullet (`mdUtils.ts:158-165`): "1.foo" → "1. foo"
# ---------------------------------------------------------------------------

_NUM_BULLET_PAT = r"(?m)^(\d+)\.[ \t]*"


def normalize_number_bullet(text: str) -> str:
    return re.sub(_NUM_BULLET_PAT, r"\1. ", text)


def normalize_number_bullet_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _NUM_BULLET_PAT, "$1. ")


# ---------------------------------------------------------------------------
# C9 normalizeMd (`mdUtils.ts:167-183`): leading spaces, empty headings,
# hard-break → paragraph break, collapse blank runs
# ---------------------------------------------------------------------------


def normalize_md(text: str) -> str:
    t = re.sub(r"(?m)^[ \t]+", "", text)
    t = re.sub(r"(?m)^#+[ \t]*$", "", t)
    t = t.replace("\\\n", "\n\n")
    t = re.sub(r"\n{3,}", "\n\n", t)
    return t


def normalize_md_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, r"(?m)^[ \t]+", "")
    c = F.regexp_replace(c, r"(?m)^#+[ \t]*$", "")
    c = F.regexp_replace(c, r"\\\n", "\n\n")
    return F.regexp_replace(c, r"\n{3,}", "\n\n")


# ---------------------------------------------------------------------------
# C4 removeRedundantSpaces (`mdUtils.ts:69-91`): trim inside "…" (…) […]
# ---------------------------------------------------------------------------


def remove_redundant_spaces(text: str) -> str:
    t = re.sub(r'"\s+([^"]*?)\s+"', r'"\1"', text)
    t = re.sub(r"\(\s+([^)]*?)\s+\)", r"(\1)", t)
    t = re.sub(r"\[\s+([^\]]*?)\s+\]", r"[\1]", t)
    return t


def remove_redundant_spaces_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, r'"\s+([^"]*?)\s+"', '"$1"')
    c = F.regexp_replace(c, r"\(\s+([^)]*?)\s+\)", "($1)")
    return F.regexp_replace(c, r"\[\s+([^\]]*?)\s+\]", "[$1]")


# ---------------------------------------------------------------------------
# C5 normalizeAsterisk (`mdUtils.ts:93-110`): fix spacing inside */**/***
# (and _/__/___) emphasis, most-nested first. The replacement moves
# trailing `*`+spaces captured inside the text group OUTSIDE the closing
# marker as right-padding — callback logic no regexp_replace can
# express, so the Column twin is a vectorized (Arrow-batched) UDF over
# the same Python mirror; goldens in tests were generated by executing
# the reference algorithm under node (byte-exact behavior capture).
# ---------------------------------------------------------------------------

# reference regexes mdUtils.ts:15-21 (reAsterisk{Three,Two,One}Pair)
_ASTERISK_RES = [
    re.compile(r"([*_]{3}) *([^*_\n][^\n]*?[^*_\n]?) *\1"),
    re.compile(r"([*_]{2}) *([^*_\n][^\n]*?[^*_\n]?) *\1"),
    re.compile(r"([*_]{1}) *([^*_\n][^\n]*?[^*_\n]?) *\1"),
]


def normalize_asterisk(text: str) -> str:
    """Python mirror of ``normalizeAsterisk`` (mdUtils.ts:93-110):
    *** → ** → * in order; per match, trailing ``*`` then trailing
    whitespace are trimmed from the inner text and re-emitted as spaces
    AFTER the closing marker (preserves outer spacing)."""

    def _fix(m: re.Match) -> str:
        marker, inner = m.group(1), m.group(2)
        trimmed = re.sub(r"\*$", "", inner).rstrip()
        pad = " " * (len(inner) - len(trimmed))
        return f"{marker}{trimmed}{marker}{pad}"

    for rx in _ASTERISK_RES:
        text = rx.sub(_fix, text)
    return text


def normalize_asterisk_col(text: Column | str) -> Column:
    """Arrow-batched UDF twin (exact parity; SURVEY C5 notes the
    trailing-pad logic is not expressible as regexp_replace)."""
    import pandas as pd  # noqa: F401  (pandas_udf requires it at runtime)
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _na(s):
        # vectorized fast path: rows with no '*' are returned untouched
        # (the common case on a real corpus), so the per-row Python
        # regex work only runs on rows that can actually change
        mask = s.notna() & s.str.contains("*", regex=False)
        out = s.copy()
        out[mask] = s[mask].map(normalize_asterisk)
        return out

    c = F.col(text) if isinstance(text, str) else text
    return _na(c)


# ---------------------------------------------------------------------------
# C11 stripSymbols (`mdUtils.ts:222-236`): strip-markdown render +
# unescape + symbol removal. The remark/strip-markdown renderer is not
# runnable here (no JS deps), so the graft defines a DETERMINISTIC
# SUBSET shared byte-for-byte by oracle and engine: markdown structure
# (images→alt, links→alt, heading/blockquote/list markers, hr) is
# stripped by explicit rules, then the reference's own post-chain runs
# verbatim (`^\\?[*-] */gm` list-escape removal, \[ \] \` unescapes,
# and the final ["'*_~\] symbol sweep). r3 (VERDICT r2 #5): code spans
# are now in the subset — fence lines drop and inline code keeps its
# content, matching strip-markdown's code→value rendering; escaped
# backticks become literal backticks through the reference's own \`
# unescape (mdUtils.ts:232) and survive the sweep, same as upstream.
# (npm is network-blocked in this sandbox, so the actual strip-markdown
# pipeline cannot be executed for byte goldens; the subset is pinned by
# q45's oracle instead.) Remaining divergences: multi-line inline code,
# 4-space-indented code blocks, and literal backticks INSIDE a
# double-tick span (strip-markdown keeps them; here the single-tick
# rule consumes them — preserving them needs a replace callback, which
# the shared python-re/Java/RE2 pattern table cannot express).
# ---------------------------------------------------------------------------

# one pattern table shared by both engines (every pattern below parses
# identically in python re and java.util.regex); replacements use \1,
# converted to $1 for the JVM side
_STRIP_STEPS: list[tuple[str, str]] = [
    (r"!\[([^\]]*)\]\(([^)]*)\)", r"\1"),  # images → alt
    (r"\[([^\]]*)\]\(([^)]*)\)", r"\1"),  # links → alt (images gone)
    # escaped backticks are literal text, not code-span delimiters: the
    # reference's \` unescape (mdUtils.ts:232) is hoisted here as a
    # sentinel (RE2 in the oracle has no lookbehind) and restored below
    (r"\\`", "\x02"),
    (r"(?m)^```[^\n]*$", ""),  # code-fence lines (code → value text)
    # double-tick form may contain single backticks (RE2-safe: no
    # lookarounds — content is non-tick runs separated by single ticks)
    (r"``([^`\n]+(?:`[^`\n]+)*)``", r"\1"),
    (r"`([^`\n]+)`", r"\1"),  # inline code → content
    (r"(?m)^#{1,6}[ \t]+", ""),  # heading markers
    (r"(?m)^(?:> ?)+", ""),  # blockquote markers
    (_MD_HR_PAT, ""),  # horizontal rules
    (r"(?m)^\\?[*-] *", ""),  # reference list-marker regex (mdUtils.ts:228)
    (r"\\\[", "["),  # unescapes (mdUtils.ts:230-232)
    (r"\\\]", "]"),
    ("\x02", "`"),  # restore escaped backticks (the \` unescape)
    (r"[\"'*_~\\]", ""),  # final symbol sweep (mdUtils.ts:234)
]


def strip_symbols(text: str) -> str:
    for pat, repl in _STRIP_STEPS:
        text = re.sub(pat, repl, text)
    return text


def strip_symbols_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in _STRIP_STEPS:
        c = F.regexp_replace(c, pat, repl.replace("\\1", "$1"))
    return c


# ---------------------------------------------------------------------------
# C12 heading extract (`src/lib/md/headingUtils.ts:3-25`)
# ---------------------------------------------------------------------------

_HEADING_RE = re.compile(r"(?m)^(#{1,6})[ \t]+(.+?)[ \t]*$")
_HEADING_PAT = r"(?m)^(#{1,6})[ \t]+(.+?)[ \t]*$"


def extract_headings(text: str) -> list[dict]:
    """[{text, level, order}] in document order (order is 1-based)."""
    return [
        {"text": m.group(2), "level": len(m.group(1)), "order": i + 1}
        for i, m in enumerate(_HEADING_RE.finditer(text))
    ]


def headings_col(text: Column | str) -> Column:
    """Array<struct<text,level,order>> — posexplode-ready, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    marks = F.regexp_extract_all(c, F.lit(_HEADING_PAT), F.lit(1))
    texts = F.regexp_extract_all(c, F.lit(_HEADING_PAT), F.lit(2))
    zipped = F.zip_with(
        marks, texts, lambda m, t: F.struct(t.alias("text"), F.length(m).alias("level"))
    )
    return F.transform(
        zipped,
        lambda s, i: F.struct(
            s["text"].alias("text"),
            s["level"].alias("level"),
            (i + 1).alias("order"),
        ),
    )


def remove_headings(text: str) -> str:
    return _HEADING_RE.sub("", text)


def remove_headings_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _HEADING_PAT, "")


# ---------------------------------------------------------------------------
# C15 footnote removeAll (`src/lib/md/footnoteUtils.ts:82-84`) and
# C13 footnote extract with cumulative-position correction (:46-80)
# ---------------------------------------------------------------------------

_FOOTNOTE_RE = re.compile(r"\[([^\[\]]+?)\]")
_FOOTNOTE_PAT = r"\[([^\[\]]+?)\]"


def remove_footnotes(text: str) -> str:
    return _FOOTNOTE_RE.sub("", text)


def remove_footnotes_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _FOOTNOTE_PAT, "")


def extract_footnotes(text: str) -> list[dict]:
    """[{label, position, order}] — position measured in the *stripped*
    text (reference corrects by cumulative length of earlier matches,
    ``footnoteUtils.ts:46-80``)."""
    out = []
    removed = 0
    for i, m in enumerate(_FOOTNOTE_RE.finditer(text)):
        out.append(
            {"label": m.group(1), "position": m.start() - removed, "order": i + 1}
        )
        removed += len(m.group(0))
    return out


# C14 footnote inject (`footnoteUtils.ts:12-39`): splice back desc-order
def inject_footnotes(text: str, notes: list[dict]) -> str:
    """Insert ``[label]`` at stripped-text positions, descending so
    offsets don't shift; positions beyond the end append (overflow
    semantics of the reference)."""
    t = text
    for n in sorted(notes, key=lambda n: n["position"], reverse=True):
        pos = min(n["position"], len(t))
        t = t[:pos] + f"[{n['label']}]" + t[pos:]
    return t


# ---------------------------------------------------------------------------
# C10 splitParagraph (`mdUtils.ts:185-220`): split on blank runs; headings
# fold into the FOLLOWING paragraph when heading_as_paragraph=False
# ---------------------------------------------------------------------------


def split_paragraphs(text: str, heading_as_paragraph: bool = True) -> list[str]:
    parts = [p for p in re.split(r"\n{2,}", text) if p.strip()]
    if heading_as_paragraph:
        return parts
    out: list[str] = []
    carry: list[str] = []
    for p in parts:
        if _HEADING_RE.fullmatch(p.strip()):
            carry.append(p.strip())
        elif carry:
            out.append("\n".join([*carry, p]))
            carry = []
        else:
            out.append(p)
    if carry:
        out.append("\n".join(carry))
    return out


def split_paragraphs_col(text: Column | str) -> Column:
    """Array<string> of non-empty paragraphs (heading_as_paragraph=True
    variant — pure built-ins; the heading-carry variant needs the Python
    mirror inside a pandas UDF)."""
    c = F.col(text) if isinstance(text, str) else text
    parts = F.split(c, r"\n{2,}")
    return F.filter(parts, lambda p: F.length(F.trim(p)) > 0)


# ---------------------------------------------------------------------------
# C17 sentence split — ONE deterministic splitter shared engine↔oracle
# (the reference uses winkNLP, `src/lib/wink-nlp.ts:4-11`; byte-parity
# requires a single spec, so the graft defines a regex splitter)
# ---------------------------------------------------------------------------

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?…])\s+(?=[\"'(\[]?[A-ZĐÀ-Ỹ0-9])")


def split_sentences(text: str) -> list[str]:
    pre = [seg for seg in text.split("\\\n") for seg in [seg.strip()] if seg]
    out: list[str] = []
    for seg in pre:
        out.extend(s for s in _SENT_SPLIT_RE.split(seg) if s.strip())
    return out


def split_sentences_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    segs = F.split(c, r"\\\n")
    sents = F.flatten(
        F.transform(
            segs,
            lambda s: F.split(
                ws_trim_col(s), r"(?<=[.!?…])\s+(?=[\"'(\[]?[A-ZĐÀ-Ỹ0-9])"
            ),
        )
    )
    return F.filter(sents, lambda s: F.length(F.trim(s)) > 0)


# ---------------------------------------------------------------------------
# C20 camelCase→SNAKE_UPPER (`treeUtils.ts:175-183`) & C21 title sanitize
# (`fileUtils.ts:26`)
# ---------------------------------------------------------------------------


def camel_to_snake_upper(s: str) -> str:
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s).upper()


def camel_to_snake_upper_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.regexp_replace(c, r"([a-z0-9])([A-Z])", "$1_$2"))


_TITLE_BAD = r'[/\\?%*:|"<>]'


def sanitize_title(s: str) -> str:
    return re.sub(_TITLE_BAD, "_", s)


def sanitize_title_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _TITLE_BAD, "_")


# ---------------------------------------------------------------------------
# cleanup pipeline (cleanupMdProcessor `mdUtils.ts:238-243`). The chain
# is DATA: each site passes its own ordered step list — the order is
# load-bearing (the reference's in-source NOTE: normalizeWhitespace
# "Have to run first so the asterisk regex can match correctly"), and
# the composition varies per site (`augustino.net/getPageContent.ts:143`
# and `hdgmvietnam.com/getPageContent.ts:137` insert a footnote-label
# rewrite between removeMdHr and normalizeWhitespace;
# `ktcgkpv.org/getPageContent.ts` runs a short chain with no
# imgs/links/hr steps on verse text). `SiteAdapter.cleanup_chain`
# carries the step names, so a new site's chain is config, not code.
# ---------------------------------------------------------------------------

# footnote link → "[label]" (`augustino.net/getPageContent.ts:140-156`;
# the JS callback returns props[1] = the 2nd capturing group). Formats:
# "[\[3\]](#link)", "[**\[3\]**](#link)", "[3](#link)".
_FOOTNOTE_LABEL = r"\[[^\\\[]*(\\\[)?([^\\]*)(\\\])?[^\\\]]*\]\(([^)]*)\)"


def footnote_label(text: str) -> str:
    return re.sub(_FOOTNOTE_LABEL, lambda m: f"[{m.group(2)}]", text)


def footnote_label_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, _FOOTNOTE_LABEL, "[$2]")


# name → (python fn, Column fn); both sides of every step share one
# pattern table, so parity tests cover the chain pair-wise
CLEANUP_STEPS: dict[str, tuple] = {
    "remove_md_imgs": (remove_md_imgs, remove_md_imgs_col),
    "remove_md_links": (remove_md_links, remove_md_links_col),
    "remove_md_hr": (remove_md_hr, remove_md_hr_col),
    "footnote_label": (footnote_label, footnote_label_col),
    "normalize_whitespace": (normalize_whitespace, normalize_whitespace_col),
    "normalize_asterisk": (normalize_asterisk, normalize_asterisk_col),
    "normalize_quotes": (normalize_quotes, normalize_quotes_col),
    "normalize_number_bullet": (normalize_number_bullet, normalize_number_bullet_col),
    "normalize_md": (normalize_md, normalize_md_col),
    "remove_redundant_spaces": (remove_redundant_spaces, remove_redundant_spaces_col),
}

# the standard chain (`thanhlinh.net/getPageContent.ts:64-78` et al.)
STANDARD_CLEANUP_CHAIN: tuple[str, ...] = (
    "remove_md_imgs",
    "remove_md_links",
    "remove_md_hr",
    "normalize_whitespace",  # must precede asterisk (reference NOTE)
    "normalize_asterisk",
    "normalize_quotes",
    "normalize_number_bullet",
    "normalize_md",
    "remove_redundant_spaces",
)

# augustino.net / hdgmvietnam.com: footnote labels collapse before
# whitespace normalization (getPageContent.ts:143-156 / :137-150)
FOOTNOTE_CLEANUP_CHAIN: tuple[str, ...] = (
    "remove_md_imgs",
    "remove_md_links",
    "remove_md_hr",
    "footnote_label",
    "normalize_whitespace",
    "normalize_asterisk",
    "normalize_quotes",
    "normalize_number_bullet",
    "normalize_md",
    "remove_redundant_spaces",
)

# ktcgkpv.org verse chain (getPageContent.ts, short form)
VERSE_CLEANUP_CHAIN: tuple[str, ...] = (
    "normalize_whitespace",
    "normalize_asterisk",
    "normalize_quotes",
    "normalize_number_bullet",
    "normalize_md",
    "remove_redundant_spaces",
)


def cleanup_chain(text: str, steps=STANDARD_CLEANUP_CHAIN) -> str:
    """`cleanupMdProcessor` — fold the named steps left-to-right, then
    trim (the reference trims at paragraph split)."""
    for name in steps:
        text = CLEANUP_STEPS[name][0](text)
    return text.strip()


def cleanup_chain_col(text: Column | str, steps=STANDARD_CLEANUP_CHAIN) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    for name in steps:
        c = CLEANUP_STEPS[name][1](c)
    return ws_trim_col(c)


def cleanup_md(text: str) -> str:
    """Standard ordered cleanup, images *removed* (post-extraction)."""
    return cleanup_chain(text, STANDARD_CLEANUP_CHAIN)


def cleanup_md_col(text: Column | str, steps=STANDARD_CLEANUP_CHAIN) -> Column:
    return cleanup_chain_col(text, steps)


# ---------------------------------------------------------------------------
# C23 proper-name extraction from footnotes
# (`ktcgkpv.org/process-proper-name.ts:22-44`) and the J7 positional
# theta join (`:46-67`): a name is accepted only if the characters
# [position-len, position) of the sentence equal it exactly
# ---------------------------------------------------------------------------


def extract_names_from_footnote(footnote_text: str) -> list[str]:
    """Python mirror: split language sections on '|', take the part
    after the first ':', cut at '--', strip digits and parenthesized
    runs, trim; keep non-empty."""
    names = []
    for section in footnote_text.split("|"):
        parts = section.split(":")
        if len(parts) < 2:
            continue
        match = parts[1].strip()
        if not match:
            continue
        name = match.split("--")[0]
        name = re.sub(r"\d", "", name)
        name = re.sub(r"\([^)]+\)", "", name).strip()
        if name:
            names.append(name)
    return names


def names_from_footnote_col(text: Column | str) -> Column:
    """Column twin of :func:`extract_names_from_footnote`."""
    c = F.col(text) if isinstance(text, str) else text
    sections = F.split(c, r"\|")
    names = F.transform(
        sections,
        # F.get (null-safe) rather than element_at: ANSI mode throws on
        # out-of-bounds, and sections without a ':' have no index 1
        lambda s: ws_trim_col(
            F.regexp_replace(
                F.regexp_replace(
                    F.get(F.split(ws_trim_col(F.get(F.split(s, ":"), 1)), "--"), 0),
                    r"\d",
                    "",
                ),
                r"\([^)]+\)",
                "",
            )
        ),
    )
    return F.filter(names, lambda n: n.isNotNull() & (F.length(n) > 0))


def find_name_matches(sentences, footnotes):
    """J7: sentences(sentence_id, text) ⨝ footnotes(sentence_id, text
    fn_text, position) → verified name spans. The theta condition —
    substring(text, start+1, len) == name — runs as a join residual on
    the JVM; candidate fan-out is bounded by names-per-footnote."""
    cand = footnotes.select(
        "sentence_id",
        F.col("position").cast("int").alias("end"),
        F.explode(names_from_footnote_col(F.col("fn_text"))).alias("name"),
    ).withColumn("start", F.col("end") - F.length("name"))
    j = sentences.join(cand, "sentence_id")
    verified = j.filter(
        (F.col("start") >= 0)
        & (F.substring(F.col("text"), F.col("start") + 1, F.length("name")) == F.col("name"))
    )
    return verified.select("sentence_id", "name", "start", "end").orderBy(
        "sentence_id", "start"
    )
