"""PII detection and redaction for training-data pipelines (north-star
extension): emails, phone numbers, and IPv4 addresses are counted and
replaced with typed placeholder tokens before text ships to a tokenizer.

Pure per-row column expressions — ``regexp_count`` over the original
text for audit counts, a fixed chain of ``regexp_replace`` for the
scrubbed text. No shuffle, no Python, full whole-stage codegen; at
100 TB this is a scan-side map stacked into the same projection as
quality/language scoring.

Pattern dialect is the Java-regex ∩ RE2 common subset (no lookaround, no
backreferences), so Spark and the DuckDB oracle match the exact same
spans. Replacement order is fixed (email → ipv4 → phone) and counts are
taken on the ORIGINAL text, so engines can't disagree on overlap
effects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Conservative PII patterns, valid and identical under Java regex (Spark)
#: and RE2 (DuckDB). \b is the ASCII word boundary in both.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PATTERN = r"\+?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"

_REDACTIONS: list[tuple[str, str, str]] = [
    ("n_emails", EMAIL_PATTERN, "[EMAIL]"),
    ("n_ipv4", IPV4_PATTERN, "[IP]"),
    ("n_phones", PHONE_PATTERN, "[PHONE]"),
]


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII audit counts plus the scrubbed text:
    ``(id, n_emails, n_ipv4, n_phones, clean_text)``."""
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).alias(name)
        for name, pat, _ in _REDACTIONS
    ]
    clean: Column = text
    for _, pat, token in _REDACTIONS:
        clean = F.regexp_replace(clean, pat, token)
    return df.select(F.col(id_col), *counts, clean.alias("clean_text"))


def inject_synthetic_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministically append synthetic PII to a subset of rows (email
    on id%3==0, phone on id%5==0, IPv4 on id%7==0) — a validation
    fixture generator so redaction is exercised on positive matches, not
    just clean text. Pure integer/string arithmetic, mirrored exactly by
    :func:`inject_synthetic_pii_sql`."""
    i = F.col(id_col)
    email = F.when(
        i % 3 == 0,
        F.concat(F.lit(" contact user"), i.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        i % 5 == 0,
        F.concat(
            F.lit(" call 555-010-"), F.lpad((i % 10000).cast("string"), 4, "0")
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        i % 7 == 0,
        F.concat(
            F.lit(" from 10.0."),
            (i % 256).cast("string"),
            F.lit("."),
            ((i * 3) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return df.withColumn(text_col, F.concat(F.col(text_col), email, phone, ip))


def inject_synthetic_pii_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB mirror of :func:`inject_synthetic_pii` — a SELECT suitable
    for use as a derived table."""
    i = id_col
    return f"""
        SELECT {i},
               {text_col}
               || CASE WHEN {i} % 3 = 0
                       THEN ' contact user' || CAST({i} AS VARCHAR) || '@example.com'
                       ELSE '' END
               || CASE WHEN {i} % 5 = 0
                       THEN ' call 555-010-' || lpad(CAST({i} % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN {i} % 7 = 0
                       THEN ' from 10.0.' || CAST({i} % 256 AS VARCHAR)
                            || '.' || CAST({i} * 3 % 256 AS VARCHAR)
                       ELSE '' END AS {text_col}
        FROM {table}
    """


def redact_pii_oracle(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB mirror of :func:`redact_pii` (RE2 'g' flag = Spark's
    replace-all default; same pattern order). DuckDB string literals keep
    backslashes verbatim, so the Python patterns embed as-is."""
    counts = ",\n               ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) AS {name}"
        for name, pat, _ in _REDACTIONS
    )
    clean = text_col
    for _, pat, token in _REDACTIONS:
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    return f"""
        SELECT {id_col},
               {counts},
               {clean} AS clean_text
        FROM {table}
    """
