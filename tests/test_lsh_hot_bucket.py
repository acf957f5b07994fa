"""Hot-LSH-bucket grid salting: a deliberately hot bucket (many copies of
one page, the boilerplate case at web scale) must produce the IDENTICAL
pair set with salting on (tiny cap) and off (huge cap), while no single
bucket cell exceeds ~2x the cap (the straggler bound).

Reference behavior: near-dup semantics per uk_address_matcher-style LSH
(candidates share a band bucket; minhash verifies exact Jaccard)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray


def _docs_table(n_hot: int = 200, n_cold: int = 60) -> pa.Table:
    hot_text = "the quick brown fox jumps over the lazy dog again and again"
    cold = [
        f"unique document number {i} with words alpha beta gamma delta {i * 7}"
        for i in range(n_cold)
    ]
    texts = [hot_text] * n_hot + cold
    ids = list(range(n_hot + n_cold))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})


def _pairs_set(ds, cols):
    rows = ds.take_all()
    return {tuple(r[c] for c in cols) for r in rows}


def test_minhash_hot_bucket_salting_identical_pairs():
    from uk_address_matcher_ray.stages.dedup import minhash_lsh_pairs

    tbl = _docs_table()
    kw = dict(num_perm=8, bands=4, shingle_k=3, jaccard_threshold=0.5)
    unsalted = _pairs_set(
        minhash_lsh_pairs(
            ray.data.from_arrow(tbl), hot_bucket_rows=1_000_000_000, **kw
        ),
        ("id_a", "id_b", "jaccard"),
    )
    salted = _pairs_set(
        minhash_lsh_pairs(ray.data.from_arrow(tbl), hot_bucket_rows=16, **kw),
        ("id_a", "id_b", "jaccard"),
    )
    # all 200 identical docs pair with each other: 19900 pairs minimum
    assert len(unsalted) >= 200 * 199 // 2
    assert salted == unsalted


def test_simhash_hot_bucket_salting_identical_pairs():
    from uk_address_matcher_ray.stages.dedup import simhash_pairs

    tbl = _docs_table()
    unsalted = _pairs_set(
        simhash_pairs(
            ray.data.from_arrow(tbl), max_hamming=3, hot_bucket_rows=1_000_000_000
        ),
        ("id_a", "id_b", "hamming"),
    )
    salted = _pairs_set(
        simhash_pairs(ray.data.from_arrow(tbl), max_hamming=3, hot_bucket_rows=16),
        ("id_a", "id_b", "hamming"),
    )
    assert len(unsalted) >= 200 * 199 // 2
    assert salted == unsalted


def test_expand_lsh_rows_each_pair_meets_exactly_once():
    """Grid invariant: every unordered row pair of a hot bucket lands in
    exactly one (bucket-cell, salt-compatible) pairing."""
    from uk_address_matcher_ray.stages.dedup import (
        _cell_pair_indices,
        _expand_lsh_rows,
    )

    n = 137
    cap = 10
    bkey = np.uint64(0xDEADBEEFCAFE)
    bflat = np.full(n, bkey, dtype=np.uint64)
    idh = np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
    hot = {int(bkey): n}
    sel, bk, cs, ct, salt = _expand_lsh_rows(bflat, idh, hot, cap)

    seen: dict = {}
    order = np.argsort(bk, kind="stable")
    bk_s, sel_s, cs_s, ct_s, salt_s = (
        bk[order],
        sel[order],
        cs[order],
        ct[order],
        salt[order],
    )
    bounds = np.flatnonzero(bk_s[1:] != bk_s[:-1]) + 1
    starts = np.concatenate([[0], bounds, [len(bk_s)]])
    cell_sizes = []
    for gi in range(len(starts) - 1):
        s, e = starts[gi], starts[gi + 1]
        cell_sizes.append(e - s)
        xi, yi = _cell_pair_indices(salt_s[s:e], int(cs_s[s]), int(ct_s[s]))
        for x, y in zip(sel_s[s:e][xi], sel_s[s:e][yi]):
            key = (min(x, y), max(x, y))
            seen[key] = seen.get(key, 0) + 1
    assert all(v == 1 for v in seen.values())
    assert len(seen) == n * (n - 1) // 2
    # straggler bound: expected cell size is ~2x cap; binomial salt variance
    # at this tiny cap needs slack (relative deviation ~1/sqrt(cap) at the
    # production cap of 4096)
    assert max(cell_sizes) <= 5 * cap
