"""PII detection and redaction for corpus cleaning.

Regex-only (the portable core of tools like Presidio's pattern
recognizers): emails, US SSNs, US phone numbers, IPv4 addresses.  Each
pattern is written in the RE2 ∩ java.util.regex common subset so the
Spark engine and the DuckDB oracle match byte-for-byte.

Scale shape: pure Catalyst ``regexp_replace`` / ``regexp_count`` column
expressions — fused into the scan, zero shuffle, whole-stage codegen.

Redaction order matters only for patterns that could nest; phone is
redacted before IPv4 so a dotted phone (``555.123.4567``) can't leave a
digit run an IP pattern would half-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts", "sql_redact_pii", "sql_pii_counts"]

#: ordered (kind, regex, replacement token)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its ``<KIND>`` token."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """{kind: match count} on the ORIGINAL text (count first, then
    redact — the patterns are mutually non-overlapping by digit shape)."""
    return {
        kind: F.regexp_count(text, F.lit(pat))
        for kind, pat, _ in PII_PATTERNS
    }


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def sql_redact_pii(col: str) -> str:
    """DuckDB twin of :func:`redact_pii` (needs the 'g' flag — DuckDB
    replaces only the first match by default, Spark replaces all)."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, '{token}', 'g')"
    return out


def sql_pii_counts(col: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_counts` (len of extract_all — DuckDB has
    no regexp_count)."""
    return {
        kind: f"len(regexp_extract_all({col}, {_sql_quote(pat)}))"
        for kind, pat, _ in PII_PATTERNS
    }
