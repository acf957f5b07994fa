"""minhash_lsh_pairs_ab (cross-corpus fuzzy decontamination) vs a
brute-force reference: pairs (a in A, b in B) whose exact Jaccard over
60-bit shingle hashes >= threshold AND that share >= 1 LSH band bucket.
Covers the integer-id path (including A/B id collisions, which the side
tag must separate) and the string-id path."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.functions import hashing as H

_WORD = st.sampled_from(
    ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
     "pack", "my", "box", "with", "five", "dozen", "liquor", "jugs"]
)
_DOC = st.lists(_WORD, min_size=1, max_size=30).map(" ".join)

NUM_PERM, BANDS, K, THRESH = 8, 4, 3, 0.5


def _feats(text):
    from uk_address_matcher_ray.stages.dedup import _tokens

    A, B = H.minhash_coeffs(NUM_PERM)
    toks = _tokens(text)
    if not toks:
        return None
    sh = sorted({H.h60(s) for s in H.shingles(toks, K)})
    vals = [h % H.MINHASH_P for h in sh]
    sig = [
        min((A[p] * v + B[p]) % H.MINHASH_P for v in vals)
        for p in range(NUM_PERM)
    ]
    return set(sh), set(H.band_keys(sig, BANDS))


def _brute_ab(docs_a, docs_b):
    fa = {i: f for i, t in docs_a if (f := _feats(t)) is not None}
    fb = {i: f for i, t in docs_b if (f := _feats(t)) is not None}
    out = set()
    for a, (sa, ba) in fa.items():
        for b, (sb, bb) in fb.items():
            if not (ba & bb):
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= THRESH:
                out.add((a, b))
    return out


def _run(ds_a, ds_b):
    from tests.test_entry_queries import _to_arrow
    from uk_address_matcher_ray.stages.dedup import minhash_lsh_pairs_ab

    out = minhash_lsh_pairs_ab(
        ds_a, ds_b, num_perm=NUM_PERM, bands=BANDS, shingle_k=K,
        jaccard_threshold=THRESH,
    )
    tbl = _to_arrow(out)
    return set(zip(tbl.column("id_a").to_pylist(), tbl.column("id_b").to_pylist()))


@pytest.mark.usefixtures("ray_session")
@given(
    texts_a=st.lists(_DOC, min_size=1, max_size=6),
    texts_b=st.lists(_DOC, min_size=1, max_size=6),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_ab_int_ids_match_brute_force(texts_a, texts_b):
    from uk_address_matcher_ray.util import dataset_from_table

    # overlapping id spaces on purpose: the side tag must keep them apart
    docs_a = list(enumerate(texts_a))
    docs_b = list(enumerate(texts_b))
    ds_a = dataset_from_table(pa.table({
        "doc_id": pa.array([i for i, _ in docs_a], pa.int64()),
        "text": pa.array([t for _, t in docs_a], pa.string()),
    }))
    ds_b = dataset_from_table(pa.table({
        "doc_id": pa.array([i for i, _ in docs_b], pa.int64()),
        "text": pa.array([t for _, t in docs_b], pa.string()),
    }))
    assert _run(ds_a, ds_b) == _brute_ab(docs_a, docs_b)


@pytest.mark.usefixtures("ray_session")
def test_ab_string_ids_and_no_within_corpus_pairs():
    from uk_address_matcher_ray.util import dataset_from_table

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "pack my box with five dozen liquor jugs",
    ]
    # A holds two near-identical docs: a within-corpus dup that must NOT
    # be emitted; B holds a near-dup of A's first doc plus an unrelated one.
    docs_a = [("x1", texts[0]), ("x2", texts[0]), ("y", texts[2])]
    docs_b = [("x1", texts[1]), ("z", "completely different words here")]
    ds_a = dataset_from_table(pa.table({
        "doc_id": pa.array([i for i, _ in docs_a], pa.string()),
        "text": pa.array([t for _, t in docs_a], pa.string()),
    }))
    ds_b = dataset_from_table(pa.table({
        "doc_id": pa.array([i for i, _ in docs_b], pa.string()),
        "text": pa.array([t for _, t in docs_b], pa.string()),
    }))
    got = _run(ds_a, ds_b)
    assert got == _brute_ab(docs_a, docs_b)
    # the brute force itself must contain the cross dup and nothing within-A
    assert ("x1", "x1") in got and ("x2", "x1") in got
