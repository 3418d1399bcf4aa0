"""PII detection and redaction over a text column — the compliance
stage every production training-data pipeline runs before tokenizing
(emails, North-American phone numbers, IPv4 literals; the pattern set
extends by adding (regex, token) rows).

Cross-engine discipline: the three patterns use only regex features
with identical semantics in Java's engine (Spark) and RE2 (DuckDB) —
literal classes, bounded repetition, ``\\b`` word boundaries; no
backreferences, no lookaround (RE2 has neither).  Redaction replaces
every match with a typed token, applied in a FIXED order
(email → phone → ip) so overlap resolution is deterministic; the
redacted text is returned as an md5-derived ``h32`` fingerprint so
the (potentially huge) scrubbed body never has to be compared
byte-for-byte across engines — byte identity follows from hash
identity (the web/extract.py idiom).

Plan shape: pure built-in JVM expressions (``regexp_count`` /
``regexp_replace``) — whole-stage codegen, no Python anywhere, scales
as a map-only stage with zero shuffle.  Reference analog: the
to_vertex input-parsing UDF family (SURVEY §2.9) — per-record text
transforms on the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# fixed application order — email first (its class set contains '.'
# and digits, so phone/ip tokens must never be inserted before it runs)
PATTERNS = [
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
]


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_emails, n_phones, n_ips, redacted_h32) per document.

    ``redacted_h32`` fingerprints the text after all three
    replacements; documents with no PII hash their original text
    (replace is the identity), so the column doubles as a content
    fingerprint for the scrubbed corpus.
    """
    red = F.col(text_col)
    for _, pat, tok in PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PHONE_RE))
        .cast("long")
        .alias("n_phones"),
        F.regexp_count(F.col(text_col), F.lit(IPV4_RE))
        .cast("long")
        .alias("n_ips"),
        h32(red).alias("redacted_h32"),
    )


def pii_scan_oracle_sql(
    docs_cte: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB witness over a CTE ``docs(id, text)``.  Note the 'g'
    flag — DuckDB's regexp_replace is first-match-only without it,
    while Spark's replaces every match."""
    from gminer_spark.functions import h32_sql

    red = text_col
    for _, pat, tok in PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    return f"""
WITH {docs_cte.strip()}
SELECT {id_col},
       CAST(len(regexp_extract_all({text_col}, '{EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all({text_col}, '{PHONE_RE}')) AS BIGINT)
           AS n_phones,
       CAST(len(regexp_extract_all({text_col}, '{IPV4_RE}')) AS BIGINT)
           AS n_ips,
       {h32_sql(red)} AS redacted_h32
FROM docs
"""
