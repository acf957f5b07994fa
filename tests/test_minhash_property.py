"""Hypothesis gate: minhash_lsh_pairs vs a brute-force reference.

The pipeline's output is DETERMINISTIC (not probabilistic): pairs whose
exact Jaccard over 60-bit shingle hashes >= threshold AND that share at
least one LSH band bucket. The reference computes both conditions directly
from the same primitives over all O(n^2) pairs."""

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


def _brute_pairs(docs):
    from uk_address_matcher_ray.stages.dedup import _tokens

    A, B = H.minhash_coeffs(NUM_PERM)
    feats = {}
    for i, text in docs:
        toks = _tokens(text)
        if not toks:
            continue
        sh = sorted({H.h60(s) for s in H.shingles(toks, K)})
        vals = [h % H.MINHASH_P for h in sh]
        sig = [
            min((A[p] * v + B[p]) % H.MINHASH_P for v in vals)
            for p in range(NUM_PERM)
        ]
        feats[i] = (set(sh), set(H.band_keys(sig, BANDS)))
    out = set()
    ids = sorted(feats)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, ba = feats[a]
            sb, bb = feats[b]
            if not (ba & bb):
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= THRESH:
                out.add((a, b))
    return out


@pytest.mark.usefixtures("ray_session")
@given(texts=st.lists(_DOC, min_size=2, max_size=10))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_minhash_pairs_match_bruteforce(texts):
    import ray

    from uk_address_matcher_ray.stages.dedup import minhash_lsh_pairs

    docs = list(enumerate(texts))
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    slices = [tbl.slice(i, 3) for i in range(0, tbl.num_rows, 3)]
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            ray.data.from_arrow(slices),
            num_perm=NUM_PERM,
            bands=BANDS,
            shingle_k=K,
            jaccard_threshold=THRESH,
        ).take_all()
    }
    assert got == _brute_pairs(docs)
