"""PII detection / redaction for training-data pipelines.

A standard pre-training scrub stage (same family as dedup / quality
scoring, task brief §training-data ops): count and redact emails, IPv4
addresses, and phone numbers. Pure Catalyst — `regexp_count` /
`regexp_replace` run inside whole-stage codegen, zero Python in the hot
path, embarrassingly parallel (no shuffle at any scale).

The regexes deliberately stay inside the Java-regex ∩ RE2 common subset
(character classes, bounded repetition, \\b) so the DuckDB correctness
oracle can restate them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, per-category match counts, and the redacted text.

    Redaction order is fixed (email -> ip -> phone) and global per
    pattern; counts are taken on the ORIGINAL text so they are
    independent of redaction order."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        redacted.alias("redacted"),
    )
