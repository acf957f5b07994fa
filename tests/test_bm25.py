"""BM25 top-k retrieval (stages/bm25.py)."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.bm25 import K1, B, bm25_assets, bm25_topk
from uk_address_matcher_ray.stages.dedup import _tokens


def _ds(ids, texts, parts=3):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(parts)


def _spec(ids, texts, queries, k):
    """Single-process restatement of the documented scoring contract."""
    docs = [(i, _tokens(t)) for i, t in zip(ids, texts)]
    n = len(docs)
    total = sum(len(t) for _, t in docs)
    avgdl = total / n
    df = Counter()
    for _, toks in docs:
        for t in set(toks):
            df[t] += 1
    out = []
    for qid, q in queries:
        scored = []
        for i, toks in docs:
            if not toks:
                continue
            tf = Counter(toks)
            norm = K1 * ((1.0 - B) + B * (len(toks) / avgdl))
            parts = []
            for t in sorted(set(_tokens(q))):
                if df[t] > 0 and tf[t] > 0:
                    idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                    parts.append(idf * (tf[t] * (K1 + 1.0)) / (tf[t] + norm))
            if parts:
                scored.append((round(math.fsum(parts), 6), i))
        scored.sort(key=lambda s: (-s[0], s[1]))
        out.extend((qid, i, s) for s, i in scored[:k])
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
def test_bm25_matches_spec():
    ids = list(range(10))
    texts = [
        "high street york",
        "high street leeds",
        "mill lane york york york",
        "station road",
        "",
        None,
        "york",
        "high high high street",
        "flat a mill lane",
        "church lane sudbury",
    ]
    queries = [("q1", "HIGH STREET YORK"), ("q2", "mill lane"), ("q3", "zzz")]
    got = sorted(
        (r["qid"], r["doc_id"], r["score"])
        for r in bm25_topk(_ds(ids, texts), queries, 3).take_all()
    )
    assert got == _spec(ids, texts, queries, 3)
    # q3's token never occurs: no rows
    assert not [g for g in got if g[0] == "q3"]


@pytest.mark.usefixtures("ray_session")
def test_bm25_assets_bounded_and_exact():
    ids = list(range(6))
    texts = ["a b c", "a a", "b", "c c c", "d", "a b c d"]
    df, n, total = bm25_assets(
        _ds(ids, texts), [("q", "a c zzz")], text_col="text"
    )
    assert n == 6 and total == 14
    # df counts DISTINCT docs, only for query tokens
    assert df == {"a": 3, "c": 3, "zzz": 0}


@pytest.mark.usefixtures("ray_session")
def test_bm25_partition_invariance_and_k():
    ids = list(range(30))
    texts = [f"tok{i % 5} common word street" for i in ids]
    queries = [("q", "common street tok1")]
    r1 = bm25_topk(_ds(ids, texts, parts=1), queries, 7).take_all()
    r9 = bm25_topk(_ds(ids, texts, parts=9), queries, 7).take_all()
    assert [(r["doc_id"], r["score"]) for r in r1] == [
        (r["doc_id"], r["score"]) for r in r9
    ]
    assert len(r1) == 7
    # equal-scored docs rank by ascending id
    scores = [r["score"] for r in r1]
    ids_out = [r["doc_id"] for r in r1]
    for i in range(1, len(r1)):
        if scores[i] == scores[i - 1]:
            assert ids_out[i] > ids_out[i - 1]
