"""PII redaction for LLM training-data pipelines.

Scrubs personally-identifiable spans (emails, phone numbers, IPv4
addresses, SSN-shaped ids) from a text column and reports per-type match
counts. Entirely native ``regexp_replace`` / ``regexp_count`` column
expressions — JVM-side, whole-stage-codegen, no Python in the hot path —
so at 100 TB this is a free narrow projection over the scan (no shuffle,
columns prune, predicates still push down past it).

Pattern dialect note: patterns are written in the common subset of Java
regex (Spark) and RE2 (DuckDB oracle) — character classes, bounded
repeats, non-capturing groups and ``\\b`` word boundaries only; no
backreferences or lookaround, which RE2 lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii"]

# Ordered: replacement runs top-to-bottom, so more specific shapes
# (SSN 3-2-4) precede overlapping general ones (phone 3-3-4 cannot match an
# SSN, but order is still pinned for determinism).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token_fmt: str = "<{name}>",
    out_col: str = "redacted",
) -> DataFrame:
    """Append ``out_col`` (text with every PII span replaced by its type
    token, e.g. ``<EMAIL>``) and one ``n_<type>`` count column per pattern.

    Counts are taken on the ORIGINAL text, independently per type, so they
    are insensitive to replacement order; the redacted text applies the
    patterns in dict order. Mirrors the reference's sanitization stance
    (inf→NaN scrub before storage, metadata_strategy_dataset.py:173-174):
    normalize at ingest, never at query time.
    """
    patterns = patterns or PII_PATTERNS
    red = F.col(text_col)
    out = df
    for name, pat in patterns.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
        red = F.regexp_replace(red, pat, token_fmt.format(name=name.upper()))
    return out.withColumn(out_col, red)
