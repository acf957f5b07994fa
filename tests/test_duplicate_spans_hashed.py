"""duplicate_spans hashed-exchange parity + shuffle-byte reduction.

The hashed path (phase-1 u64 span-hash exchange + phase-2 survivor-string
exchange) must be bit-identical to the legacy string exchange, and its
phase-1 exchange must be materially smaller — the VERDICT round-3 item.
Also pins the ADVICE fix: a doc_id whose rows straddle input batches
counts ONCE toward n_docs (global per-(span, doc) aggregation).
"""

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.dedup import (
    _span_exchange_hashed,
    _span_exchange_legacy,
    duplicate_spans,
)


BOILER = "this licence text is repeated verbatim across many documents here"


def _docs_table():
    rows = []
    for i in range(40):
        body = f"unique tail {i} " + " ".join(f"w{i}_{j}" for j in range(12))
        rows.append({"doc_id": i, "text": BOILER + " " + body})
    # a pair of exact duplicates and a doc with an internal repeat
    rows.append({"doc_id": 100, "text": BOILER + " " + BOILER})
    rows.append({"doc_id": 101, "text": BOILER})
    return pa.Table.from_pylist(rows)


def _as_ds(tbl, blocks=4):
    import ray.data

    n = tbl.num_rows
    step = max(1, n // blocks)
    parts = [tbl.slice(i, step) for i in range(0, n, step)]
    return ray.data.from_arrow(parts)


def _sorted_pylist(ds):
    out = ds.take_all()
    return sorted(out, key=lambda r: r["span"])


def test_hashed_matches_legacy(ray_session):
    tbl = _docs_table()
    a = _sorted_pylist(duplicate_spans(_as_ds(tbl), k=8, min_docs=2, hashed=True))
    b = _sorted_pylist(duplicate_spans(_as_ds(tbl), k=8, min_docs=2, hashed=False))
    assert a == b
    assert len(a) > 0
    spans = {r["span"] for r in a}
    assert BOILER[: len(BOILER)] .split()[:8] == BOILER.split()[:8]
    assert " ".join(BOILER.split()[:8]) in spans


def test_doc_straddling_batches_counts_once(ray_session):
    # one doc_id spread over MULTIPLE input rows in DIFFERENT blocks: its
    # windows must contribute a single unit to n_docs.
    t1 = pa.Table.from_pylist([{"doc_id": 7, "text": BOILER}])
    t2 = pa.Table.from_pylist(
        [{"doc_id": 7, "text": BOILER}, {"doc_id": 8, "text": BOILER}]
    )
    import ray.data

    ds = ray.data.from_arrow([t1, t2])
    for hashed in (True, False):
        out = _sorted_pylist(duplicate_spans(ds, k=8, min_docs=2, hashed=hashed))
        by_span = {r["span"]: r for r in out}
        first = " ".join(BOILER.split()[:8])
        assert by_span[first]["n_docs"] == 2  # docs 7 and 8, not 3 rows
        assert by_span[first]["occurrences"] == 3  # doc 7 twice + doc 8 once
        # min_docs must be on DISTINCT docs: a span seen twice in doc 7
        # only (rows in different blocks) must NOT survive
        solo = pa.Table.from_pylist(
            [{"doc_id": 1, "text": "alpha " + BOILER}]
        )
        solo2 = pa.Table.from_pylist(
            [{"doc_id": 1, "text": "alpha " + BOILER}]
        )
        solo_ds = ray.data.from_arrow([solo, solo2])
        sout = duplicate_spans(solo_ds, k=8, min_docs=2, hashed=hashed)
        assert sout.count() == 0


def test_phase1_exchange_bytes_reduced(ray_session):
    # measured on the real documents table (sf0.001): total exchange bytes
    # 1.54 MB -> 0.59 MB (2.6x), key column 1.15 MB -> 0.20 MB (5.9x) —
    # the span-string payload is what the hash removes; the id/occ columns
    # are common to both. Conservative gates below.
    import ray
    import ray.data

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def _bytes(d):
        ts = ray.get(d.materialize().to_arrow_refs())
        return sum(t.nbytes for t in ts), sum(t.column(0).nbytes for t in ts)

    legacy_total, legacy_key = _bytes(
        _span_exchange_legacy(ds, "doc_id", "text", 8, pa.int64())
    )
    hashed_total, hashed_key = _bytes(
        _span_exchange_hashed(ds, "doc_id", "text", 8, pa.int64())
    )
    assert hashed_total * 2 <= legacy_total, (hashed_total, legacy_total)
    assert hashed_key * 4 <= legacy_key, (hashed_key, legacy_key)


def test_env_knob_default(ray_session, monkeypatch):
    tbl = _docs_table()
    monkeypatch.setenv("GRAFT_SPAN_HASH_EXCHANGE", "0")
    a = _sorted_pylist(duplicate_spans(_as_ds(tbl), k=8, min_docs=2))
    monkeypatch.delenv("GRAFT_SPAN_HASH_EXCHANGE", raising=False)
    b = _sorted_pylist(duplicate_spans(_as_ds(tbl), k=8, min_docs=2))
    assert a == b
