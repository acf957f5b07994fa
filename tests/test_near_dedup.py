"""near_dedup_docs: survivors = min id per connected component of the pair
relation, plus every doc in no pair; pair ids absent from the docs table
must not surface."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _brute_survivors(doc_ids, pairs):
    parent = {i: i for i in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in doc_ids:
        comp.setdefault(find(i), []).append(i)
    return sorted(min(m) for m in comp.values())


def _run(doc_ids, pairs):
    import ray

    from uk_address_matcher_ray.stages.dedup import near_dedup_docs

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array([f"t{i}" for i in doc_ids], pa.string()),
            }
        )
    ).repartition(3)
    pairs_ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    out = near_dedup_docs(docs, pairs_ds)
    return sorted(r["doc_id"] for r in out.take_all())


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_chain_and_isolated():
    # chain 1-2-3 collapses to 1; 10-11 to 10; 20/21 isolated survive;
    # pair id 99 not in docs is ignored.
    doc_ids = [1, 2, 3, 10, 11, 20, 21]
    pairs = [(1, 2), (2, 3), (10, 11), (3, 99)]
    assert _run(doc_ids, pairs) == _brute_survivors(doc_ids, pairs) == [1, 10, 20, 21]


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_no_pairs_keeps_all():
    doc_ids = [5, 7, 9]
    assert _run(doc_ids, []) == [5, 7, 9]


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_padded_order():
    # zero-padded propagation must pick the NUMERIC min (2 < 10
    # lexicographically unpadded would pick "10")
    doc_ids = [2, 10]
    assert _run(doc_ids, [(2, 10)]) == [2]
