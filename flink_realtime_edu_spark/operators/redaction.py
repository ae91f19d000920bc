"""PII redaction — the scrubbing stage of a training-data pipeline
(SURVEY.md §2.10 X7; the C4/Dolma-style cleanup step every corpus
pass runs before packing/export).

Everything is built from chained `regexp_replace` Column expressions:
JVM-side, whole-stage-codegen-friendly, zero Python in the hot path,
no shuffle — the stage is embarrassingly parallel and at 100 TB costs
exactly one map pass over the text column, usually fused into
whatever scan/filter surrounds it.

Pattern dialect: kept to the intersection of Java regex (Spark) and
RE2 (DuckDB) so the driver oracle can replay the identical scrub —
no lookarounds, no backrefs, plain character classes + bounded
quantifiers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: emails first (their local parts can contain digits
# and dots that the later numeric patterns would otherwise chew on),
# then the most-specific numeric shapes before the most-general.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}", "<PHONE>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
)


def redact_pii(col: Column | str) -> Column:
    """Scrub every PII_PATTERNS occurrence, in order, into its
    placeholder token. Placeholders contain no digits/@/dots, so a
    later pattern can never re-match inside an earlier replacement."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_match_count(col: Column | str, pattern: str) -> Column:
    """Occurrences of one pattern in a string column (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def pii_total_count(col: Column | str) -> Column:
    """Total PII occurrences across all patterns — the residual
    audit: on redacted text this must be exactly zero."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for _, pattern, _ in PII_PATTERNS:
        total = total + pii_match_count(c, pattern)
    return total
