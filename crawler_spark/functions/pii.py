"""PII scrubbing for training-data pipelines (graft addition).

The standard pre-training hygiene pass: redact emails, phone numbers
and SSN-shaped identifiers from document text before anything
downstream sees it. Patterns are deliberately restricted to syntax
that parses AND matches identically in java.util.regex (Spark),
python ``re`` (the mirror), and RE2 (the DuckDB oracle): no
lookarounds, no backreferences — the same shared-pattern-table
technique as ``functions/text.py``'s C11 steps.

Replacement ORDER is part of the spec: emails first (their local
part may contain digits), then SSNs, then phones — an SSN is also a
valid match for the looser phone pattern, so the more specific rule
must run first. The redaction tokens contain no digits or ``@`` and
cannot re-trigger later rules.

Everything is a JVM-side ``regexp_replace`` chain (whole-stage
codegen, no Python in the hot path); the Python mirror exists for
oracles and tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — applied in order; keep RE2/Java/python-safe
PII_STEPS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    (r"\+?\d[\d \-()]{7,}\d", "<PHONE>"),
]


def scrub_pii_col(text: Column | str) -> Column:
    """Redacted text column (pure JVM regexp chain)."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_STEPS:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_pii(text: str) -> str:
    """Python mirror of :func:`scrub_pii_col` (oracle/test twin)."""
    for pat, repl in PII_STEPS:
        text = re.sub(pat, repl, text)
    return text


def pii_counts_col(text: Column | str) -> dict[str, Column]:
    """{kind: count} columns — how many redactions each rule made.
    Counted BEFORE scrubbing on the same precedence (earlier rules'
    matches are masked out so kinds never double-count), mirroring
    the replacement semantics."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    masked = c
    for (pat, repl), name in zip(PII_STEPS, ("emails", "ids", "phones")):
        out[name] = F.size(F.regexp_extract_all(masked, F.lit(pat), 0))
        masked = F.regexp_replace(masked, pat, repl)
    return out
