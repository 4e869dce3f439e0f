"""PII redaction for training-data pipelines.

Masks the identifiers the crawler extracts — emails and phone numbers,
using the SAME patterns as the extraction pass
(``functions.contacts.EMAIL_PATTERN`` / ``PHONE_PATTERN``, which mirror
reference break_checker.py:985-991) — so a corpus cleaned by this
operator is exactly the complement of what ``extract_contacts`` finds.

Pure Catalyst ``regexp_replace`` / ``regexp_extract_all``: JVM-side,
whole-stage codegen, no Python in the hot path. At 100 TB this is a
narrow projection over the text column with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.contacts import EMAIL_PATTERN, PHONE_PATTERN

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"


def redact_emails(text: Column) -> Column:
    return F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)


def redact_phones(text: Column) -> Column:
    return F.regexp_replace(text, PHONE_PATTERN, PHONE_TOKEN)


def redact_pii(text: Column) -> Column:
    """Mask emails then phones.

    Email-first ordering is load-bearing: an address whose local part
    contains a long digit run must be masked whole, not first split by
    the phone matcher.
    """
    return redact_phones(redact_emails(text))


def pii_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document counts of redactable identifiers + the cleaned text."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_PATTERN), F.lit(0))).alias(
            "n_phones"
        ),
        redact_pii(t).alias("redacted"),
    )
