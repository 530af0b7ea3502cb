"""PII detection and redaction over text columns (SURVEY §2.5 D12).

A training-data pipeline must be able to answer "how much personally
identifying information does this corpus carry, and strip it before
export".  This module is that gate, kept entirely in built-in regex
expressions so the whole thing is one map stage — no UDF, no shuffle,
whole-stage-codegen all the way down:

- :data:`PII_PATTERNS` — the detector regexes (email, phone, SSN-style
  national id, payment-card number, IPv4, URL).  Deliberately
  lookaround- and backreference-free so the SAME pattern string runs
  identically under Spark's ``java.util.regex`` and DuckDB's RE2 (the
  oracle engine); both treat ``\\d`` as ASCII ``[0-9]`` and support
  ``\\b`` word boundaries.
- :func:`pii_counts` / :func:`pii_profile` — per-type match counts per
  row (each type counted independently on the ORIGINAL text, so counts
  are order-free and engine-portable).
- :func:`redact` / :func:`redact_pii` — replace every match with a
  ``[TYPE]`` token.  Redaction is sequential in :data:`REDACTION_ORDER`
  (URLs first: an URL can embed an email-shaped userinfo part; the
  replacement tokens contain no digits or ``@``, so later patterns
  never match inside an earlier redaction).
- :func:`pii_gate` — boolean "passes" column for funnel use
  (``curate_annotated(max_pii=...)`` rejects PII-heavy rows as a
  map-only stage).

Scale shape: pure column arithmetic over one projection of the text
column — zero Exchange (plan-gated in tests/test_pii.py), linear in
corpus bytes, embarrassingly partition-parallel at 100 TB.

These are *pattern* detectors: they flag well-formed identifiers, not
free-text names/addresses (which need an NER model — out of scope for
a regex gate, and the standard first-pass/model-pass split in public
pipelines).  Payment-card matches are format-level (grouped 16-digit);
Luhn checksum validation needs arithmetic over the digit string and is
intentionally left to a downstream verifier.

Reference provenance: the reference plugin (Cassandra KV/lease layer,
``CassandraListenerRegistry.scala:27``) has no document pipeline; this
is part of the LLM-pipeline closure built on the engine's own operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detector regexes.  Constraints for engine portability (Java regex AND
# RE2): no lookarounds, no backreferences, ASCII digit classes only.
PII_PATTERNS: dict[str, str] = {
    # local part, @, dotted domain with a 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # optional 1-2 digit country code, (415)- or 415-style area code,
    # then 3-4 digit groups; no leading \b (a '(' has no word boundary
    # against a preceding space), trailing \b stops partial digit runs
    "phone": r"(?:\+?\d{1,2}[-. ])?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}\b",
    # US-SSN-shaped 3-2-4 national id
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # grouped payment-card number (4x4, '-' or ' ' separated)
    "cc": r"\b(?:\d{4}[- ]){3}\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "url": r"https?://[^\s]+",
}

# Sequential redaction order: URLs before email (userinfo URLs), the
# fully-punctuated formats (ssn/cc) before the looser phone pattern.
REDACTION_ORDER: tuple[str, ...] = ("url", "email", "ssn", "cc", "phone", "ipv4")


def _check_types(types) -> tuple[str, ...]:
    types = tuple(types) if types is not None else REDACTION_ORDER
    unknown = [t for t in types if t not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII type(s) {unknown}; known: {sorted(PII_PATTERNS)}")
    return types


def pii_counts(text_col: str | Column = "text",
               types=None) -> dict[str, Column]:
    """Per-type match-count columns (``{type: Column}``), each counted
    independently on the original text — counts are order-independent
    and identical across regex engines."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        t: F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[t]), F.lit(0)))
        .cast("long")
        .alias(f"n_{t}")
        for t in _check_types(types)
    }


def pii_total(text_col: str | Column = "text", types=None) -> Column:
    """Total PII hits across ``types`` (sum of the per-type counts)."""
    counts = list(pii_counts(text_col, types).values())
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return total.alias("pii_total")


def pii_profile(df: DataFrame, text_col: str = "text",
                types=None) -> DataFrame:
    """``df`` plus one ``n_<type>`` count column per PII type and a
    ``pii_total`` sum.  One map stage; no shuffle."""
    out = df
    for t, c in pii_counts(text_col, types).items():
        out = out.withColumn(f"n_{t}", c)
    return out.withColumn("pii_total", pii_total(text_col, types))


def redact(text_col: str | Column = "text", types=None) -> Column:
    """The text with every PII match replaced by its ``[TYPE]`` token,
    applied in :data:`REDACTION_ORDER` (restricted to ``types``)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    wanted = set(_check_types(types))
    for t in REDACTION_ORDER:
        if t in wanted:
            col = F.regexp_replace(col, PII_PATTERNS[t], f"[{t.upper()}]")
    return col.alias("redacted")


def redact_pii(df: DataFrame, text_col: str = "text", types=None,
               out_col: str | None = None) -> DataFrame:
    """``df`` with ``out_col`` (default: ``text_col`` replaced in place)
    holding the redacted text."""
    return df.withColumn(out_col or text_col, redact(text_col, types))


def pii_gate(text_col: str | Column = "text", max_hits: int = 0,
             types=None) -> Column:
    """True when the row carries at most ``max_hits`` PII matches —
    the map-only funnel gate (reject reason ``pii_heavy``)."""
    return (pii_total(text_col, types) <= F.lit(max_hits)).alias("passes_pii")
