"""PII detection and redaction as pure codegen regex expressions.

Not part of the reference's surface; a standard LLM-corpus-pipeline
stage. Every function compiles to JVM-side `regexp_count` /
`regexp_replace` inside whole-stage codegen — no Python on the hot
path, so cost is one regex scan per pattern per row and the operator
is embarrassingly parallel at any scale (no shuffle, no state).

Patterns are deliberately conservative ASCII classics (email, NANP
phone, SSN, IPv4, 16-digit card). They use only syntax shared by
Java's regex and RE2 (`\\b \\d {m,n}` — no lookaround), so the same
pattern strings drive a DuckDB/Trino oracle verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "redact_pii"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Ordered: applied in this sequence during redaction. Email first (its
# local part may contain digit runs), then the longer digit shapes
# before the shorter ones so card/SSN matches are not broken up by the
# phone rule. The shapes are mutually exclusive on group arity
# (4-4-4-4 card, 3-2-4 SSN, 3-3-4 phone, 4×(1-3) IPv4) but ordering
# keeps that true even for adversarial concatenations.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column | str) -> Column:
    """Struct of per-category match counts + `total` (all bigint).

    One `regexp_count` per category — five codegen regex scans per row,
    no shuffle."""
    t = _c(text)
    counts = {
        kind: F.regexp_count(t, F.lit(pat)).cast("bigint")
        for kind, pat in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return F.struct(
        *[c.alias(k) for k, c in counts.items()], total.alias("total")
    )


def redact_pii(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with a typed placeholder (`<EMAIL>`,
    `<CREDIT_CARD>`, `<SSN>`, `<PHONE>`, `<IPV4>`).

    Chained global `regexp_replace` in PII_PATTERNS order; `kinds`
    restricts (and reorders are ignored — canonical order always
    applies, it is part of the semantics)."""
    t = _c(text)
    wanted = set(PII_PATTERNS if kinds is None else kinds)
    for kind, pat in PII_PATTERNS.items():
        if kind in wanted:
            t = F.regexp_replace(t, pat, f"<{kind.upper()}>")
    return t
