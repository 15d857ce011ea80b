"""PII detection and redaction over document text.

Large-scale training-data curation redacts personally identifiable
information before training (emails, IP addresses, phone numbers are the
standard regex-detectable classes — cf. the BigScience ROOTS / BigCode
StarCoder preprocessing pipelines, which ship exactly this email/IP
redaction step). This module provides per-document PII counts and a
placeholder-redacted text column.

Engine notes:
  * Every pattern below is written in the common subset of Java regex
    (Spark codegen) and RE2 (the DuckDB oracle): no lookbehind, no
    backreferences. Both engines therefore find the identical match set
    and the contract oracle reproduces counts and redacted text
    byte-for-byte.
  * Scale shape: detection and redaction are pure string projections
    inside WholeStageCodegen — zero shuffles, zero Python; a 100 TB corpus
    redacts at scan speed and the filter ``has_pii`` prunes before any
    downstream join.

Reference parity: the reference engine has no PII pass (it is an
entity-resolution system, not a curation pipeline); this operator belongs
to the training-data-pipeline extension mandated alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies email first (the other classes cannot match
# inside an already-redacted placeholder). Patterns are Java-regex ∩ RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
]


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class, computed on the ORIGINAL text
    (before any redaction) so the classes are independent of apply order."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact_text(text: Column) -> Column:
    """Sequential global regexp_replace, email -> ipv4 -> phone. Spark's
    regexp_replace is global by default; the oracle uses the 'g' flag."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    redact: bool = True,
) -> DataFrame:
    """Per-document PII profile: counts per class, a ``has_pii`` flag, and
    (when ``redact``) the placeholder-redacted text. Null text is treated
    as empty (0 counts, empty redaction) — null-safe like every analyzer.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col), *pii_counts(text)]
    out = docs.select(*cols)
    flag = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    out = out.withColumn("has_pii", flag)
    if redact:
        redacted = docs.select(F.col(id_col), redact_text(text).alias("text_redacted"))
        out = out.join(redacted, id_col)
    return out


def pii_project(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Single-pass projection variant (no join): id, extras, counts, flag,
    redacted text — the shape to use in a pipeline, one codegen stage."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = pii_counts(text)
    flag = None
    for _, pat, _ in PII_PATTERNS:
        cond = F.regexp_count(text, F.lit(pat)) > 0
        flag = cond if flag is None else (flag | cond)
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        *counts,
        flag.alias("has_pii"),
        redact_text(text).alias("text_redacted"),
    )
