"""kmeans_assign / semdedup (stages/similarity.py) vs local numpy references.

The driver-level DuckDB oracle covers sf0.01 bit-exactness
(kmeans_clusters / semdedup_docs); these tests pin the semantics on a
tiny controlled input — including the tile loop, which the small oracle
input never exercises with more than one tile per cluster.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from uk_address_matcher_ray.stages.similarity import (
    _normalized,
    kmeans_assign,
    semdedup,
    train_centroids,
)


def _synth_embeddings(n: int = 60, dim: int = 8, seed: int = 7):
    rng = np.random.RandomState(seed)
    base = rng.randn(4, dim)
    vecs = []
    for i in range(n):
        v = base[i % 4] + 0.25 * rng.randn(dim)
        if i % 9 == 0 and i > 0:
            v = vecs[i - 1] + 0.01 * rng.randn(dim)  # planted near-dups
        vecs.append(v)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )


@pytest.fixture(scope="module")
def emb_tbl():
    return _synth_embeddings()


def _local_assign(tbl, num_centroids=4, iters=3):
    ds = ray.data.from_arrow(tbl)
    cents = train_centroids(ds, num_centroids, iters=iters)
    mat = _normalized([list(v) for v in tbl.column("embedding").to_pylist()])
    return np.argmax(mat @ cents.T, axis=1), mat


def test_kmeans_assign_matches_local_argmax(emb_tbl):
    ds = ray.data.from_arrow(emb_tbl)
    out = kmeans_assign(ds, num_centroids=4).take_all()
    got = {r["vec_id"]: r["cid"] for r in out}
    expect, _ = _local_assign(emb_tbl)
    assert len(got) == emb_tbl.num_rows
    for i, cid in enumerate(expect):
        assert got[i] == cid


def test_semdedup_matches_bruteforce_within_cluster(emb_tbl):
    assign, mat = _local_assign(emb_tbl)
    ds = ray.data.from_arrow(emb_tbl)
    out = semdedup(ds, threshold=0.95, num_centroids=4).take_all()
    by_id = {r["vec_id"]: r for r in out}
    n = emb_tbl.num_rows
    assert len(by_id) == n
    for i in range(n):
        mates = [j for j in range(i) if assign[j] == assign[i]]
        r = by_id[i]
        assert r["cid"] == assign[i]
        if not mates:
            assert r["max_cos_smaller"] is None
            assert r["is_dup"] is False
        else:
            mx = max(float(mat[i] @ mat[j]) for j in mates)
            assert r["max_cos_smaller"] == pytest.approx(mx, abs=1e-6)
            assert r["is_dup"] == (mx >= 0.95)
    # the planted i-1 copies must be flagged at a high threshold
    flagged = {r["vec_id"] for r in out if r["is_dup"]}
    planted = {i for i in range(1, n) if i % 9 == 0}
    assert planted <= flagged


def test_semdedup_tiling_is_invariant(emb_tbl):
    ds = ray.data.from_arrow(emb_tbl)
    a = sorted(
        semdedup(ds, threshold=0.9, num_centroids=2, tile_rows=3).take_all(),
        key=lambda r: r["vec_id"],
    )
    b = sorted(
        semdedup(ds, threshold=0.9, num_centroids=2, tile_rows=1024).take_all(),
        key=lambda r: r["vec_id"],
    )
    assert a == b
