"""Windowed PMI: brute-force differential, oracle parity, edge cases."""

import math
from collections import Counter

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.pmi import token_pmi, token_pmi_sql


def _brute(texts, window, min_count, min_pair):
    import re

    docs = [
        [t for t in re.split(r"\s+", (x or "").lower().strip()) if t]
        for x in texts
    ]
    uni = Counter(t for d in docs for t in d)
    total = sum(uni.values())
    vocab = {t for t, c in uni.items() if c >= min_count}
    pairs = Counter()
    for d in docs:
        for i, a in enumerate(d):
            for j in range(i + 1, min(i + window + 1, len(d))):
                b = d[j]
                if a in vocab and b in vocab:
                    pairs[(min(a, b), max(a, b))] += 1
    p_total = sum(pairs.values())
    out = {}
    for (a, b), c in pairs.items():
        if c >= min_pair:
            out[(a, b)] = (
                c,
                round(
                    math.log(c) + 2 * math.log(total) - math.log(p_total)
                    - math.log(uni[a]) - math.log(uni[b]),
                    6,
                ),
            )
    return out


TEXTS = [
    "the cat sat on the mat the cat",
    "the dog sat on the log",
    "cat and dog and cat",
    "x y x y x y x",
    "solo",
    "",
    None,
]


@pytest.mark.usefixtures("ray_session")
def test_pmi_brute_force_and_oracle():
    import ray

    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": TEXTS,
        }
    )
    got = {
        (r["tok_a"], r["tok_b"]): (r["pair_count"], r["pmi"])
        for r in token_pmi(
            ray.data.from_arrow(docs), window=2, min_count=2, min_pair=1
        ).take_all()
    }
    assert got == _brute(TEXTS, 2, 2, 1)

    con = duckdb.connect()
    con.register("documents", docs)
    exp = {
        (r["tok_a"], r["tok_b"]): (r["pair_count"], r["pmi"])
        for r in con.sql(
            token_pmi_sql(window=2, min_count=2, min_pair=1)
        ).arrow().to_pylist()
    }
    con.close()
    assert got == exp


@pytest.mark.usefixtures("ray_session")
def test_pmi_window_and_floor_effects():
    import ray

    docs = pa.table({"text": ["a b c a b c a b c", "a c a c"]})
    ds = ray.data.from_arrow(docs)
    # window=1: only adjacent pairs -> (a,b),(b,c),(a,c from doc2)
    w1 = {
        (r["tok_a"], r["tok_b"]) for r in token_pmi(
            ds, window=1, min_count=1, min_pair=1
        ).take_all()
    }
    assert w1 == {("a", "b"), ("b", "c"), ("a", "c")}
    # min_count floor excludes tokens below it entirely
    floored = token_pmi(ds, window=2, min_count=100, min_pair=1).take_all()
    assert floored == []


@pytest.mark.usefixtures("ray_session")
def test_pmi_empty_input():
    import ray

    ds = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = token_pmi(ds).take_all()
    assert out == []
