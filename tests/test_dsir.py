"""DSIR importance resampling (stages/dsir.py)."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

from uk_address_matcher_ray.functions.hashing import h60
from uk_address_matcher_ray.stages.dsir import (
    _grams,
    dsir_assets,
    dsir_select,
    dsir_weights,
)
from uk_address_matcher_ray.stages.dedup import _tokens

B = 64  # small bucket count so collisions actually occur in tests


def _spec_weights(raw_texts, tgt_texts, texts):
    """Single-process restatement of the documented estimator."""

    def counts(ts):
        c = [0] * B
        for t in ts:
            for g in _grams(_tokens(t)):
                c[h60(g) % B] += 1
        return c, sum(c)

    rc, rt = counts(raw_texts)
    tc, tt = counts(tgt_texts)
    out = []
    for t in texts:
        grams = _grams(_tokens(t))
        if not grams:
            out.append((0, None))
            continue
        terms = [
            math.log((tc[h60(g) % B] + 1.0) / (tt + B))
            - math.log((rc[h60(g) % B] + 1.0) / (rt + B))
            for g in grams
        ]
        out.append((len(grams), round(math.fsum(terms), 6)))
    return out


def _ds_of(texts):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_match_spec():
    import ray

    raw = [
        "the quick brown fox",
        "slow green turtle crawls",
        "the quick quick fox",
        "",
        None,
        "one",
    ]
    tgt = ["the quick brown fox jumps", "quick brown fox"]
    raw_ds = _ds_of(raw)
    tgt_ds = _ds_of(tgt)
    assets = dsir_assets(raw_ds, tgt_ds, buckets=B)
    rows = dsir_weights(raw_ds, ray.put(assets)).take_all()
    got = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in rows}
    want = dict(enumerate(_spec_weights(raw, tgt, raw)))
    assert got == want
    # target-like docs outrank dissimilar ones
    assert got[0][1] > got[1][1]
    # empty/None docs: 0 grams, NULL weight
    assert got[3] == (0, None)
    assert got[4] == (0, None)
    # single token: 1 unigram, 0 bigrams
    assert got[5][0] == 1


@pytest.mark.usefixtures("ray_session")
def test_dsir_select_topk_and_ties():
    import ray

    # two docs with identical text => identical logw: tie broken by id
    raw = ["quick brown fox"] * 3 + ["zzz yyy xxx"] * 3 + [""]
    tgt = ["quick brown fox"]
    raw_ds = _ds_of(raw)
    assets = dsir_assets(raw_ds, _ds_of(tgt), buckets=B)
    w = dsir_weights(raw_ds, ray.put(assets))
    sel = dsir_select(w, 4).take_all()
    ids = [r["doc_id"] for r in sel]
    assert ids == [0, 1, 2, 3]  # 3 matches, then lowest-id dissimilar
    # NULL-logw (empty) docs never selected even when n exceeds candidates
    sel_all = dsir_select(dsir_weights(raw_ds, ray.put(assets)), 99).take_all()
    assert len(sel_all) == 6


@pytest.mark.usefixtures("ray_session")
def test_dsir_partition_invariance():
    import ray

    texts = [f"tok{i} tok{(i * 3) % 7} shared common words" for i in range(40)]
    tgt = ["shared common words appear here"]
    a1 = dsir_assets(_ds_of(texts), _ds_of(tgt), buckets=B)
    w1 = dsir_weights(_ds_of(texts).repartition(1), ray.put(a1)).take_all()
    w9 = dsir_weights(_ds_of(texts).repartition(9), ray.put(a1)).take_all()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(w1, key=key) == sorted(w9, key=key)
