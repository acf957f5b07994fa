"""Round-4 operators: chunk_documents (stages/chunking.py),
rolling_window (stages/sessions.py), ccnet_perplexity_buckets
(stages/lm.py) — brute-force property tests with adversarial inputs
(timestamp TIES inside and on the window edge, empty/whitespace docs,
tie-heavy perplexity bins).  Driver-shape DuckDB parity for all three
runs in tests/test_entry_queries.py."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.chunking import chunk_documents
from uk_address_matcher_ray.stages.sessions import rolling_window


def _ds(rows, schema, blocks=3):
    from uk_address_matcher_ray.util import dataset_from_table

    return dataset_from_table(
        pa.Table.from_pylist(rows, schema=schema), target_blocks=blocks
    )


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

_DOC_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("text", pa.string())]
)


def _chunk_brute(rows, window, stride):
    out = []
    for r in rows:
        toks = (r["text"] or "").split()
        for s in range(0, len(toks), stride):
            sl = toks[s : s + window]
            out.append((r["doc_id"], s // stride, len(sl), " ".join(sl)))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.text(
            alphabet=" abX\t\n",
            max_size=40,
        ),
        min_size=0,
        max_size=20,
    ),
    window=st.integers(1, 6),
    over=st.integers(0, 3),
)
def test_chunk_documents_property(data, window, over):
    stride = max(window - over, 1)
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(data)]
    got = chunk_documents(
        _ds(rows, _DOC_SCHEMA), window=window, stride=stride
    ).take_all()
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in got
    )
    assert got == _chunk_brute(rows, window, stride)


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_edge_cases():
    rows = [
        {"doc_id": 1, "text": ""},          # no chunks
        {"doc_id": 2, "text": "   \t  "},   # whitespace only: no chunks
        {"doc_id": 3, "text": None},        # null text: no chunks
        {"doc_id": 4, "text": "a b c"},     # single short chunk
        {"doc_id": 5, "text": " ".join(f"t{i}" for i in range(7))},
    ]
    got = chunk_documents(_ds(rows, _DOC_SCHEMA), window=4, stride=3).take_all()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {4, 5}
    assert [r["chunk_text"] for r in sorted(by_doc[5], key=lambda r: r["chunk_id"])] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6",
    ]
    # overlap invariant: consecutive chunks share window - stride tokens
    c0, c1 = by_doc[5][0], by_doc[5][1]
    assert c0["chunk_text"].split()[3:] == c1["chunk_text"].split()[:1]


# ---------------------------------------------------------------------------
# rolling_window
# ---------------------------------------------------------------------------

_EV_SCHEMA = pa.schema(
    [
        pa.field("eid", pa.int64()),
        pa.field("k", pa.int64()),
        pa.field("ts", pa.int64()),
        pa.field("v", pa.float64()),
    ]
)


def _roll_brute(rows, window):
    out = {}
    for r in rows:
        frame = [
            x
            for x in rows
            if x["k"] == r["k"] and r["ts"] - window <= x["ts"] <= r["ts"]
        ]
        cents = sum(int(np.rint(x["v"] * 100.0)) for x in frame)
        out[r["eid"]] = (len(frame), cents)
    return out


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),      # key
            st.integers(0, 30),     # ts — small domain forces ties
            st.floats(-10, 10, allow_nan=False, width=32),
        ),
        min_size=0,
        max_size=60,
    ),
    window=st.integers(0, 12),
)
def test_rolling_window_property(rows, window):
    data = [
        {"eid": i, "k": k, "ts": t, "v": float(v)}
        for i, (k, t, v) in enumerate(rows)
    ]
    got = rolling_window(
        _ds(data, _EV_SCHEMA),
        key="k",
        ts="ts",
        window=window,
        value="v",
        id_col="eid",
    ).take_all()
    assert len(got) == len(data)
    brute = _roll_brute(data, window)
    for r in got:
        assert (r["roll_n"], r["roll_cents"]) == brute[r["eid"]], r


@pytest.mark.usefixtures("ray_session")
def test_rolling_window_edge_semantics():
    """Inclusive lower bound and all-peers-included (RANGE frame)."""
    data = [
        {"eid": 1, "k": 1, "ts": 0, "v": 1.0},
        {"eid": 2, "k": 1, "ts": 0, "v": 2.0},   # peer of eid 1
        {"eid": 3, "k": 1, "ts": 10, "v": 4.0},  # exactly window back edge
        {"eid": 4, "k": 1, "ts": 20, "v": 8.0},  # eid 3 on its back edge
        {"eid": 5, "k": 2, "ts": 10, "v": 16.0},  # other key
    ]
    got = {
        r["eid"]: (r["roll_n"], r["roll_cents"])
        for r in rolling_window(
            _ds(data, _EV_SCHEMA), key="k", ts="ts", window=10,
            value="v", id_col="eid",
        ).take_all()
    }
    assert got[1] == (2, 300)  # both ts=0 peers, including the later eid 2
    assert got[2] == (2, 300)
    assert got[3] == (3, 700)  # ts >= 10 - 10 = 0 inclusive
    assert got[4] == (2, 1200)  # [10, 20]: eid 3 (inclusive back edge) + itself
    assert got[5] == (1, 1600)


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_ccnet_buckets_tertiles():
    """Tie-heavy per-language bins: the type-1 tertile split puts
    ceil(n/3) of the scoreable docs in head (+ pbin ties), null-ppl docs
    bucket NULL, and every scoreable doc lands in exactly one bucket."""
    from uk_address_matcher_ray.stages.lm import ccnet_perplexity_buckets

    rows = []
    texts_en = (
        ["common words repeat here"] * 6
        + ["rare zx qq vv words appear once maybe twice"] * 3
        + ["common words repeat here common words repeat"] * 3
    )
    for i, t in enumerate(texts_en):
        rows.append({"doc_id": i, "lang": "en", "text": t})
    rows.append({"doc_id": 100, "lang": "fr", "text": "un deux trois un deux"})
    rows.append({"doc_id": 101, "lang": "fr", "text": "quatre cinq"})
    rows.append({"doc_id": 102, "lang": "fr", "text": "solo"})  # 1 token: NULL
    schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("lang", pa.string()),
            pa.field("text", pa.string()),
        ]
    )
    out = ccnet_perplexity_buckets(_ds(rows, schema)).take_all()
    assert len(out) == len(rows)
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[102]["bucket"] is None and by_id[102]["n_bigrams"] == 0
    en = [r for r in out if r["lang"] == "en"]
    assert all(r["bucket"] in ("head", "middle", "tail") for r in en)
    # identical texts (identical pbin) always share a bucket
    seen = {}
    for r in out:
        if r["perplexity"] is None:
            continue
        key = (r["lang"], math.floor(r["perplexity"] * 100))
        assert seen.setdefault(key, r["bucket"]) == r["bucket"]
    # bucket boundaries are monotone in perplexity per language
    rank = {"head": 0, "middle": 1, "tail": 2}
    en_sorted = sorted(
        (r for r in en if r["perplexity"] is not None),
        key=lambda r: r["perplexity"],
    )
    ranks = [rank[r["bucket"]] for r in en_sorted]
    assert ranks == sorted(ranks)
