"""Incremental snapshot dedup (stages/snapshot.py) and the df-bounded
inverted index (stages/index.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.index import inverted_index
from uk_address_matcher_ray.stages.snapshot import incremental_dedup


def _ds(ids, texts, id_type=pa.int64(), parts=3):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, id_type),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(parts)


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_basic():
    new = _ds(
        [1, 2, 3, 4, 5],
        ["alpha", "beta", "gamma", "alpha", None],
    )
    seen = _ds([90, 91], ["beta", "delta"])
    out = incremental_dedup(new, seen).take_all()
    ids = sorted(r["doc_id"] for r in out)
    # 'beta' (id 2) is in the kept corpus; everything else survives,
    # including BOTH copies of 'alpha' (incremental dedup is vs the seen
    # side only — intra-snapshot dedup is exact_dedup's job)
    assert ids == [1, 3, 4, 5]
    hashes = {r["doc_id"]: r["content_hash"] for r in out}
    assert hashes[1] == hashes[4]


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_empty_and_null_text():
    # None and '' hash identically by the h60(t or '') contract —
    # a seen empty doc drops new None/'' docs
    new = _ds([1, 2, 3], [None, "", "x"])
    seen = _ds([9], [""])
    ids = sorted(
        r["doc_id"] for r in incremental_dedup(new, seen).take_all()
    )
    assert ids == [3]


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_no_seen_overlap():
    new = _ds([1, 2], ["a", "b"])
    seen = _ds([9], ["zzz"])
    assert (
        sorted(r["doc_id"] for r in incremental_dedup(new, seen).take_all())
        == [1, 2]
    )


def _spec_index(ids, texts, min_df, max_df):
    from uk_address_matcher_ray.stages.dedup import _tokens

    posts: dict = {}
    for i, t in zip(ids, texts):
        for tok in set(_tokens(t)):
            posts.setdefault(tok, set()).add(i)
    out = {}
    for tok, s in posts.items():
        if len(s) < min_df or (max_df is not None and len(s) > max_df):
            continue
        out[tok] = sorted(s)
    return out


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_matches_spec():
    ids = list(range(12))
    texts = [
        f"common tok{i % 3} rare{i} Common" for i in ids
    ]  # 'common' df=12 (case-folded), tok0/1/2 df=4, rare_i df=1
    for min_df, max_df in [(1, None), (2, 10), (1, 4), (4, 4)]:
        ds = _ds(ids, texts, parts=4)
        rows = inverted_index(ds, min_df=min_df, max_df=max_df).take_all()
        got = {r["token"]: r["postings"] for r in rows}
        want = _spec_index(ids, texts, min_df, max_df)
        assert got == want, (min_df, max_df)
        for r in rows:
            assert r["df"] == len(r["postings"])


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_string_ids_and_dups():
    # duplicate (token, doc) pairs across batches collapse; string ids
    # sort bytewise
    ids = ["m2", "c1", "m1", "c1x"]
    texts = ["x y x", "y x", "y", "x"]
    ds = _ds(ids, texts, id_type=pa.string(), parts=2)
    rows = inverted_index(ds, min_df=1, max_df=None).take_all()
    got = {r["token"]: r["postings"] for r in rows}
    assert got == {"x": ["c1", "c1x", "m2"], "y": ["c1", "m1", "m2"]}


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_empty_input():
    ds = _ds([], [], parts=1)
    assert inverted_index(ds, min_df=1, max_df=5).take_all() == []
