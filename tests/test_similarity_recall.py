"""IVF recall vs the exact brute-force baseline (the no-SQL-oracle check for
the approximate index), plus block-size invariance of the exact block-pairwise
embedding near-dup operator."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_brute_force():
    import ray

    from uk_address_matcher_ray.stages.similarity import brute_force_topk, ivf_topk

    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not available")
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    qids = sorted({r["vec_id"] for r in ds.select_columns(["vec_id"]).take_all()})[:5]
    truth = {
        (r["query_id"], r["vec_id"]) for r in brute_force_topk(ds, qids, k=10).take_all()
    }
    got4 = {(r["query_id"], r["vec_id"]) for r in ivf_topk(ds, qids, k=10).take_all()}
    assert len(got4 & truth) / len(truth) >= 0.8  # measured 0.86 at nprobe=4
    got6 = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(ds, qids, k=10, nprobe=6).take_all()
    }
    assert len(got6 & truth) / len(truth) >= 0.9  # measured 0.96 at nprobe=6


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_block_size_invariant():
    """The exact block-pairwise operator must produce the same pair set at
    any block partitioning (each unordered pair meets in exactly one task)."""
    import ray

    from uk_address_matcher_ray.stages.dedup import embedding_near_dup_pairs

    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not available")
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")

    def pairset(block_rows):
        out = embedding_near_dup_pairs(ds, threshold=0.35, block_rows=block_rows)
        return {(r["id_a"], r["id_b"], round(r["cosine"], 9)) for r in out.take_all()}

    big = pairset(10_000)  # single block
    small = pairset(64)  # many block-pair tasks
    assert big == small
    assert len(big) > 0
