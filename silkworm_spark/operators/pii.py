"""PII detection and redaction for training-data pipelines.

Pre-training corpora are scanned (and usually redacted) for contact
PII before release; the standard shapes are regex families for emails,
phone numbers, and IP addresses (e.g. the C4 and BigScience ROOTS
pipelines). Both operators are pure column expressions — JVM regex in
whole-stage codegen, no Python, no shuffles at all — so they run at
scan speed over any corpus size and compose with the other per-doc
stages for free.

The patterns deliberately stick to constructs Java regex and RE2
interpret identically (character classes, bounded repetition, ASCII
word boundaries) so a DuckDB oracle reproduces every match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kept RE2-compatible (no lookaround, no backrefs) for oracle parity;
# email matches case-insensitively ((?i) — identical in Java regex and
# RE2) so Alice@Example.COM is detected and redacted, not silently kept
PII_PATTERNS: dict[str, str] = {
    "email": r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\b[0-9]{3}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "phone": "[PHONE]",
    "ipv4": "[IP]",
}


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, has_pii) — match counts per
    category plus the boolean a filter policy thresholds on."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(PII_PATTERNS["email"]))
    n_phones = F.regexp_count(t, F.lit(PII_PATTERNS["phone"]))
    n_ips = F.regexp_count(t, F.lit(PII_PATTERNS["ipv4"]))
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("has_pii"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted) — every PII match replaced by its category
    token. Order matters: emails first (an email contains no phone/IP
    match, but redacting IPs first could split a hostname-like email
    domain); the chain is a single projection either way."""
    out = F.col(text_col)
    for kind in ("email", "phone", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], REDACTION_TOKENS[kind])
    return docs.select("doc_id", out.alias("redacted"))
