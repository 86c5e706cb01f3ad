"""PII detection and redaction for training-data curation.

A large-scale pretraining pipeline scrubs personally identifiable
information before the corpus ships: emails, phone numbers, IP
addresses, national-id-shaped numbers.  Like the rest of the text
family (`functions/textstats.py`) these are pure column expressions —
`regexp_extract_all` for detection counts, ordered `regexp_replace`
chains for redaction — so the scrub is JVM-side, codegen'd, and
embarrassingly parallel; no UDF, no driver loop.

The patterns are intentionally RE2-compatible (no backreferences, no
lookaround) so the DuckDB oracle replays them verbatim; Spark's Java
regex and DuckDB's RE2 agree on this subset.  Redaction applies the
patterns in declaration order — the order is part of the contract,
since an email contains digit runs a later pattern might otherwise
clip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement token) — order is the redaction order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_count(text: Column | str, pattern: str) -> Column:
    """Occurrence count of one PII pattern (long)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast("long")


def redact_pii(text: Column | str) -> Column:
    """Replace every occurrence of every pattern with its token, in
    ``PII_PATTERNS`` order."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, tok in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tok)
    return c


# --- DuckDB mirrors ------------------------------------------------------

def sql_pii_count(expr: str, pattern: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{pattern}')) AS BIGINT)"


def sql_redact_pii(expr: str) -> str:
    out = expr
    for _, pat, tok in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out
