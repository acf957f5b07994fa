"""Winnowing fingerprints (stages/winnow.py) vs a brute-force reference,
plus the paper's guarantee: two docs sharing >= w + k - 1 consecutive
tokens share at least one selected fingerprint.  Driver-shape DuckDB
parity runs in tests/test_entry_queries.py."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.functions import hashing as H
from uk_address_matcher_ray.stages.dedup import _tokens
from uk_address_matcher_ray.stages.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)

_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("text", pa.string())]
)


def _ds(rows, blocks=3):
    from uk_address_matcher_ray.util import dataset_from_table

    return dataset_from_table(
        pa.Table.from_pylist(rows, schema=_SCHEMA), target_blocks=blocks
    )


def _brute_fingerprints(text, k, w):
    toks = _tokens(text)
    if not toks:
        return set()
    grams = H.shingles(toks, k)
    hs = [H.h60(g) for g in grams]
    sel = set()
    if len(hs) < w:
        windows = [(0, len(hs))]
    else:
        windows = [(e - w + 1, e + 1) for e in range(w - 1, len(hs))]
    for lo, hi in windows:
        mn = min(hs[lo:hi])
        # rightmost position holding the window minimum
        pos = max(p for p in range(lo, hi) if hs[p] == mn)
        sel.add((pos, mn))
    return sel


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()),
            min_size=0,
            max_size=30,
        ).map(" ".join),
        min_size=0,
        max_size=12,
    ),
    k=st.integers(1, 4),
    w=st.integers(1, 5),
)
def test_winnow_fingerprints_property(data, k, w):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(data)]
    got = winnow_fingerprints(_ds(rows), k=k, w=w).take_all()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for r in rows:
        assert by_doc.get(r["doc_id"], set()) == _brute_fingerprints(
            r["text"], k, w
        ), (r, k, w)


@pytest.mark.usefixtures("ray_session")
def test_winnow_guarantee_and_pairs():
    """Shared run of >= w + k - 1 tokens => shared fingerprint; the pair
    join surfaces it; a fingerprint common to ALL docs (df > max_df) is
    dropped."""
    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 >= w + k - 1 = 6
    rows = [
        {"doc_id": 1, "text": f"one two {shared} three"},
        {"doc_id": 2, "text": f"{shared} nine ten eleven twelve"},
        {"doc_id": 3, "text": "totally different words here only once"},
    ]
    fp = winnow_fingerprints(_ds(rows), k=k, w=w)
    sets: dict = {}
    for r in fp.take_all():
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert sets[1] & sets[2], "winnowing guarantee violated"
    assert not (sets[1] & sets[3])
    pairs = winnow_pairs(fp, min_shared=1, max_df=64).take_all()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}
    # df cap: a gram in every doc is boilerplate and never pairs
    many = [
        {"doc_id": i, "text": f"{shared} unique{i} tail{i} word{i}"}
        for i in range(10)
    ]
    fp2 = winnow_fingerprints(_ds(many), k=k, w=w)
    capped = winnow_pairs(fp2, min_shared=1, max_df=3).take_all()
    fps2: dict = {}
    for r in fp2.take_all():
        fps2.setdefault(r["fp"], set()).add(r["doc_id"])
    uncapped_expected = {
        f for f, docs in fps2.items() if 2 <= len(docs) <= 3
    }
    got_pairs = {(p["id_a"], p["id_b"]) for p in capped}
    want_pairs = set()
    for f in uncapped_expected:
        ds_ = sorted(fps2[f])
        for i in range(len(ds_)):
            for j in range(i + 1, len(ds_)):
                want_pairs.add((ds_[i], ds_[j]))
    assert got_pairs == want_pairs
