"""Per-source KL divergence: brute-force differential, oracle parity,
floor/edge cases, KL >= 0 property."""

import math
import re
from collections import Counter

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.kl import source_kl, source_kl_sql


def _brute(rows, min_count):
    toks = [
        (g, [t for t in re.split(r"\s+", (x or "").lower().strip()) if t])
        for g, x in rows
    ]
    uni = Counter(t for _, d in toks for t in d)
    vocab = {t: c for t, c in uni.items() if c >= min_count}
    tv = sum(vocab.values())
    per = {}
    for g, d in toks:
        cd = Counter(t for t in d if t in vocab)
        if cd:
            agg = per.setdefault(g, Counter())
            agg.update(cd)
    out = {}
    for g, cd_map in per.items():
        td = sum(cd_map.values())
        terms = [
            (cd / td) * math.log((cd * tv) / (td * vocab[t]))
            for t, cd in sorted(cd_map.items())
        ]
        out[g] = (td, round(math.fsum(terms), 6))
    return out


ROWS = [
    ("a", "the cat sat on the mat"),
    ("a", "the dog ran far away"),
    ("b", "spam spam spam buy now buy"),
    ("b", "now now now spam"),
    ("c", "the the cat dog the"),
    ("d", "zzz qqq"),   # all below-floor tokens -> no row
    ("e", ""),
    ("e", None),
]


@pytest.mark.usefixtures("ray_session")
def test_source_kl_brute_and_oracle():
    import ray

    docs = pa.table(
        {
            "source": [g for g, _ in ROWS],
            "text": [t for _, t in ROWS],
        }
    )
    got = {
        r["source"]: (r["n_tokens"], r["kl"])
        for r in source_kl(ray.data.from_arrow(docs), min_count=2).take_all()
    }
    assert got == _brute(ROWS, 2)
    assert "d" not in got and "e" not in got
    # KL is non-negative up to the round-6 contract
    assert all(kl >= -1e-6 for _, kl in got.values())

    con = duckdb.connect()
    con.register("documents", docs)
    exp = {
        r["source"]: (r["n_tokens"], r["kl"])
        for r in con.sql(source_kl_sql(min_count=2)).arrow().to_pylist()
    }
    con.close()
    assert got == exp


@pytest.mark.usefixtures("ray_session")
def test_source_kl_single_source_is_zero():
    import ray

    docs = pa.table(
        {"source": ["x", "x"], "text": ["a b c a", "b c a b"]}
    )
    out = source_kl(ray.data.from_arrow(docs), min_count=1).take_all()
    # one source == the corpus -> identical distributions -> KL 0
    assert len(out) == 1 and out[0]["kl"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_source_kl_empty():
    import ray

    docs = pa.table(
        {
            "source": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }
    )
    assert source_kl(ray.data.from_arrow(docs)).take_all() == []
