"""Exactness gate for ngram_jaccard_pairs: the prefix-filter join must
return EXACTLY the brute-force set of pairs with Jaccard >= threshold —
no false negatives (the prefix lemma) and no extras (the verify step) —
including when hot prefix buckets force the salt-grid path."""

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

K, THRESH = 3, 0.5


def _brute_pairs(docs, k=K, thresh=THRESH):
    from uk_address_matcher_ray.stages.dedup import _tokens

    feats = {}
    for i, text in docs:
        toks = _tokens(text)
        if not toks:
            continue
        feats[i] = {H.h60(s) for s in H.shingles(toks, k)}
    out = {}
    ids = sorted(feats)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = feats[a], feats[b]
            j = len(sa & sb) / len(sa | sb)
            if j >= thresh:
                out[(a, b)] = j
    return out


def _run(docs, hot_bucket_rows=4096, thresh=THRESH):
    import ray

    from uk_address_matcher_ray.stages.dedup import ngram_jaccard_pairs

    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    slices = [tbl.slice(i, 3) for i in range(0, tbl.num_rows, 3)]
    return {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            ray.data.from_arrow(slices),
            shingle_k=K,
            jaccard_threshold=thresh,
            hot_bucket_rows=hot_bucket_rows,
        ).take_all()
    }


@pytest.mark.usefixtures("ray_session")
@given(texts=st.lists(_DOC, min_size=2, max_size=10))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_ngram_pairs_match_bruteforce(texts):
    docs = list(enumerate(texts))
    assert _run(docs) == _brute_pairs(docs)


@pytest.mark.usefixtures("ray_session")
def test_ngram_pairs_hot_bucket_salting_exact():
    # 40 near-identical docs -> every prefix shingle is a hot bucket at
    # cap=8; the grid-salted path must still produce the exact pair set.
    base = "the quick brown fox jumps over the lazy dog pack my box"
    docs = [(i, base if i % 2 == 0 else base + f" extra{i % 3}") for i in range(40)]
    got = _run(docs, hot_bucket_rows=8)
    assert got == _run(docs, hot_bucket_rows=4096)
    assert got == _brute_pairs(docs)


@pytest.mark.usefixtures("ray_session")
def test_ngram_boundary_jaccard_kept():
    # Jaccard exactly at the threshold must be KEPT (>=, and the in-bucket
    # size filter min/max >= t must not drop the boundary pair).
    # 4 tokens with k=3 -> shingles {t1 t2 t3, t2 t3 t4}; overlap crafted:
    a = "alpha beta gamma"        # 3 tokens -> 1 shingle (whole doc)
    b = "alpha beta gamma delta"  # -> 2 shingles, one shared -> J = 0.5
    got = _run([(0, a), (1, b)], thresh=0.5)
    assert got == {(0, 1): 0.5}
