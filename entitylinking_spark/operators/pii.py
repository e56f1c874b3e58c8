"""PII detection and scrubbing for training-data pipelines.

A standard pre-training hygiene pass (the C4/Dolma/FineWeb pipelines all
carry one): find and mask emails, phone numbers, IPv4 addresses and
SSN-shaped ids before the corpus is tokenized. No reference analogue —
this is part of the §2-adjacent LLM-pipeline surface the engine owns.

Everything is JVM-native regexp (whole-stage codegen, no Python). The
patterns are deliberately RE2-safe (no backreferences or lookaround) so a
DuckDB oracle runs the exact same regexes; both engines use
leftmost-first greedy matching, so counts and replacements agree.

Scale: per-row column expressions only — no shuffle, no UDF, no state.
A 100 TB corpus pays one codegen'd scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Scrub order matters where shapes overlap: SSN (3-2-4) before phone
# (3-3-4) keeps each masked by its own tag; email and IPv4 are disjoint
# from both. dict order IS the applied order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d{9,15}\b|\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: str | Column, kind: str) -> Column:
    """Occurrences of one PII kind (see PII_PATTERNS keys)."""
    return F.regexp_count(_c(col), F.lit(PII_PATTERNS[kind]))


def scrub_pii(col: str | Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Mask every PII occurrence with its typed tag (`<EMAIL>`, `<SSN>`,
    `<PHONE>`, `<IPV4>`), applied in PII_PATTERNS order."""
    out = _c(col)
    for kind in kinds or tuple(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_report(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII audit: one count column per kind, a total, and the
    scrubbed text. Column order is stable (PII_PATTERNS order)."""
    counts = [
        pii_count(text_col, kind).alias(f"n_{kind}") for kind in PII_PATTERNS
    ]
    total = sum(
        (F.col(f"n_{kind}") for kind in PII_PATTERNS), F.lit(0)
    ).alias("n_pii")
    return docs.select(
        F.col(id_col), *counts, scrub_pii(text_col).alias("scrubbed")
    ).withColumn("n_pii", total)
