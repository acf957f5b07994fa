"""PII redaction (stages/pii.py): differential vs DuckDB's RE2 regexp
functions (the oracle's exact expressions) on adversarial strings, plus
the Dataset surface."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.pii import (
    EMAIL_RE,
    EMAIL_TOKEN,
    IP_TOKEN,
    IPV4_RE,
    PHONE_RE,
    PHONE_TOKEN,
    redact_batch,
    redact_pii,
)

_ADVERSARIAL = [
    "a@b.io x 1.2.3.4 y 020-7946-0042 z a@b.io",
    "",
    "no pii",
    "999.999.999.999",                      # ipv4 pattern is shape-only
    "+1 555 123 4567and text",              # phone glued to a word
    "a.b@c.d.ee 0.0.0.0 00-11-22-33-44",
    "user@sub.domain.co.uk @not.an@email",
    "12345678",                             # too short for the phone RE
    "1-2-3-4-5-6-7-8-9",
    "x@y.zz@w.vv",                          # overlapping email candidates
    "tel: +44 (0)20 7946 0042",             # parens break the digit run
    "ip 10.0.0.1.2.3 extra octets",
]


def _duck(texts):
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(texts))), "text": texts}))
    return con.sql(
        f"""
        WITH r1 AS (
          SELECT i, len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
                 regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g') AS t1
          FROM t),
        r2 AS (
          SELECT i, ne, len(regexp_extract_all(t1, '{IPV4_RE}')) AS ni,
                 regexp_replace(t1, '{IPV4_RE}', '{IP_TOKEN}', 'g') AS t2
          FROM r1)
        SELECT regexp_replace(t2, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS red,
               ne, ni, len(regexp_extract_all(t2, '{PHONE_RE}')) AS nph
        FROM r2 ORDER BY i
        """
    ).fetchall()


def _check(texts):
    t3, ne, ni, nph = redact_batch(pa.array(texts, pa.string()))
    mine = list(zip(t3.to_pylist(), ne.to_pylist(), ni.to_pylist(), nph.to_pylist()))
    assert mine == _duck(texts)


def test_adversarial_strings_match_duckdb():
    _check(_ADVERSARIAL)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab @.+-0123456789\n",
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fuzz_matches_duckdb(texts):
    _check(texts)


@pytest.mark.usefixtures("ray_session")
def test_dataset_surface():
    import ray

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["mail me: x@y.io", "call +44 20 7946 0042 at 10.0.0.1"],
                pa.string(),
            ),
        }
    )
    rows = {r["doc_id"]: r for r in redact_pii(ray.data.from_arrow(tbl)).take_all()}
    assert rows[0]["text_redacted"] == "mail me: <EMAIL>"
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 0
    assert rows[1]["text_redacted"] == "call <PHONE> at <IP>"
    assert rows[1]["n_ips"] == 1 and rows[1]["n_phones"] == 1
