"""embedding_lsh_pairs: approximate cosine near-dup via random-hyperplane
LSH. Emitted pairs must be exactly verified (subset of the exact operator's
pairs — no false positives) with high recall on the testdata embeddings."""

from __future__ import annotations

import os

import pytest

from uk_address_matcher_ray.stages.dedup import (
    embedding_lsh_pairs,
    embedding_near_dup_pairs,
)

SF_DIR = "/root/testdata/sf0.01"


def _clustered_vectors(n_base=120, dups_per=3, dim=64, seed=17):
    """Deterministic near-dup corpus: base unit vectors plus small
    perturbations of each — every (base, dup) and (dup, dup) pair of one
    family has cosine >= ~0.97; cross-family cosines stay low."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1)[:, None]
    ids, vecs = [], []
    next_id = 0
    for i in range(n_base):
        ids.append(next_id)
        vecs.append(base[i])
        next_id += 1
        for _d in range(dups_per if i % 4 == 0 else 0):
            v = base[i] + 0.03 * rng.standard_normal(dim)
            ids.append(next_id)
            vecs.append(v / np.linalg.norm(v))
            next_id += 1
    import pyarrow as pa

    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.astype(float).tolist() for v in vecs],
                pa.list_(pa.float64()),
            ),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_lsh_subset_and_recall_clustered():
    import ray

    tbl = _clustered_vectors()
    ds = ray.data.from_arrow(tbl).repartition(4)
    threshold = 0.9
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            ds, id_col="vec_id", threshold=threshold
        ).take_all()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_pairs(
            ds, id_col="vec_id", threshold=threshold
        ).take_all()
    }
    assert len(exact) > 20  # the corpus genuinely has near-dups
    # exactness of the verify step: no false positives
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact))


@pytest.mark.usefixtures("ray_session")
def test_lsh_no_false_positives_on_testdata():
    import ray

    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not available")
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    threshold = 0.5
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            ds, id_col="vec_id", threshold=threshold
        ).take_all()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_pairs(
            ds, id_col="vec_id", threshold=threshold
        ).take_all()
    }
    assert approx <= exact


@pytest.mark.usefixtures("ray_session")
def test_lsh_deterministic():
    import ray

    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not available")
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    a = sorted(
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_pairs(ds, id_col="vec_id", threshold=0.9).take_all()
    )
    b = sorted(
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_pairs(ds, id_col="vec_id", threshold=0.9).take_all()
    )
    assert a == b
