"""PII detection / redaction — a standard curation stage for LLM
training corpora (additive to the reference, whose ETL is scan +
truncate only: src/main.cpp:40-53; same inventory family as
operators/dedup.py and operators/decontam.py).

Patterns are deliberately restricted to a regex subset on which Java's
backtracking engine (Spark) and RE2 (DuckDB) provably agree: greedy
quantifiers over character classes, no alternation, no backreferences
— leftmost-first and leftmost-longest coincide there, so the engine
and the oracle redact bit-identically.

Scale posture: pure JVM ``regexp_replace`` / ``regexp_count``
expression work inside whole-stage codegen — one scan, no shuffle, no
Python. At 100 TB this is embarrassingly parallel map work; the only
knob that matters is input split size.

NOTE (learned this round): pass patterns to Spark through the typed
column API (``F.regexp_*`` with ``F.lit``) — embedding them in
``F.expr`` strings lets Spark's SQL *string literal* parser eat
``\\b`` as a backspace escape before the regex engine ever sees it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: applied top-to-bottom on both engines (order matters —
# e.g. the SSN pattern must not see digits already consumed by a
# phone match).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_counts(col: Column | str) -> dict[str, Column]:
    """One exact match count per PII class (before any redaction)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Text with every PII class replaced by its placeholder, applied
    in :data:`PII_PATTERNS` order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_counts` (RE2; '\\b' passes through
    DuckDB's non-escaping standard string literals verbatim)."""
    return {
        name: f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS INT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` — same patterns, same order,
    global replacement."""
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
