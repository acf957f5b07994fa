"""PII redaction for web-scale training corpora.

The C4 / FineWeb-style scrub: replace e-mail addresses, IPv4 addresses
and phone-number-shaped digit runs with typed placeholder tokens before
training.  The reference engine (RobinL/uk_address_matcher) has no
counterpart; part of the LLM-training-data surface this engine adds
(SURVEY.md §2-extras).

Scale shape: pure row-local ``map_batches`` — zero shuffles.  All three
patterns run as vectorized RE2 kernels over the Arrow string buffer
(``pyarrow.compute.replace_substring_regex`` /
``count_substring_regex``); no Python-level row loop.  DuckDB's regexp
functions are RE2 too, so the oracle (`regexp_replace(..., 'g')` +
``len(regexp_extract_all(...))``) matches byte-for-byte.

Redaction ORDER is part of the contract (mirrored by the oracle):
e-mails first (their digit runs must not look like phones), then IPv4
(dotted quads would otherwise be eaten digit-run-wise by the phone
pattern), then phones over the already-redacted text.  Counts are taken
on the text each pattern actually scans, so ``n_emails + n_ips +
n_phones`` is exactly the number of placeholders inserted.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe (no lookaround/backreferences) so pyarrow and DuckDB agree.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international-ish: optional +, then >=9 chars of digits/space/hyphen
# bracketed by digits — matches '+44 20 7946 0042', '020-7946-0042'.
PHONE_RE = r"\+?\d[\d \-]{7,}\d"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_batch(texts: pa.ChunkedArray | pa.Array):
    """(text_redacted, n_emails, n_ips, n_phones) arrays for one batch —
    each count measured on the text its pattern scans (see module doc)."""
    n_emails = pc.count_substring_regex(texts, EMAIL_RE)
    t1 = pc.replace_substring_regex(texts, EMAIL_RE, EMAIL_TOKEN)
    n_ips = pc.count_substring_regex(t1, IPV4_RE)
    t2 = pc.replace_substring_regex(t1, IPV4_RE, IP_TOKEN)
    n_phones = pc.count_substring_regex(t2, PHONE_RE)
    t3 = pc.replace_substring_regex(t2, PHONE_RE, PHONE_TOKEN)
    return (
        t3,
        n_emails.cast(pa.int64()),
        n_ips.cast(pa.int64()),
        n_phones.cast(pa.int64()),
    )


def redact_pii(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset(id, text_redacted, n_emails, n_ips, n_phones)."""

    def kernel(batch: pa.Table) -> pa.Table:
        t3, n_emails, n_ips, n_phones = redact_batch(batch.column(text_col))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_redacted": t3,
                "n_emails": n_emails,
                "n_ips": n_ips,
                "n_phones": n_phones,
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
