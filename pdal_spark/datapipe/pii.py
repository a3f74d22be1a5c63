"""PII redaction for web-text corpora.

Every LLM training pipeline scrubs personally identifiable information
before tokenization (cf. the C4 / RefinedWeb / Dolma cleanup stages):
emails, IP addresses, phone numbers are replaced with placeholder
tokens, and per-type match counts are kept as document metadata (high
PII density is itself a quality/filtering signal).

Design constraints (same as textstats):
  * pure built-in column expressions — regexp_replace / regexp_count;
    zero Python in the hot path, runs at scan speed.
  * the regex subset behaves identically under Java regex (Spark) and
    RE2 (DuckDB): no lookaround, no backrefs, non-capturing groups and
    \\b word boundaries only, and alternatives ordered so leftmost-first
    (Java) and leftmost-longest (RE2-POSIX is not used by DuckDB's
    regexp_* functions, which are leftmost-first like Java) agree.
  * redaction order is fixed (email -> ipv4 -> phone) and counts are
    measured on the progressively-redacted text, so later patterns can
    never double-count characters an earlier pattern consumed (a
    phone-shaped email local part is the email's) and ``n_<type>``
    always equals the ``<TYPE>`` tokens inserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_redacted`` plus ``n_<type>`` match counts per row.

    Each pattern is counted on the text AS THE REPLACE CHAIN SEES IT
    (i.e. after the previous patterns were redacted), so ``n_<type>``
    always equals the number of ``<TYPE>`` tokens inserted — a
    phone-shaped string living inside an email's local part is the
    email's, not a phantom phone. Per-row projection only — no
    shuffle, fully pipelined into the scan at 100 TB."""
    out = df
    red: Column = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(red, F.lit(pat)).cast("long")
        )
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("text_redacted", red)


def pii_redact_sql(text: str = "text") -> dict[str, str]:
    """DuckDB twin: identical patterns, identical count-on-redacted
    chaining; regexp_replace needs the 'g' flag (DuckDB replaces only
    the first match by default, Spark replaces all). Returns
    {output_col: sql_expr}."""
    exprs: dict[str, str] = {}
    red = text
    for name, pat, token in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        exprs[f"n_{name}"] = f"len(regexp_extract_all({red}, '{sql_pat}'))"
        red = f"regexp_replace({red}, '{sql_pat}', '{token}', 'g')"
    exprs["text_redacted"] = red
    return exprs
