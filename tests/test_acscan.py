"""Aho-Corasick scan: overlap semantics, nested phrases, differential
vs str-scan brute force, oracle parity."""

import random
import string

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.acscan import (
    _Automaton,
    ac_scan,
    ac_scan_sql,
)


def _brute_count(text, phrase):
    # overlapping occurrences
    n = 0
    start = 0
    while True:
        i = text.find(phrase, start)
        if i < 0:
            return n
        n += 1
        start = i + 1


@pytest.mark.usefixtures("ray_session")
def test_ac_overlaps_nested_and_oracle():
    import ray

    texts = ["aaa bb aaa", "she sells seashells on the seashore",
             "", None, "hehehehe"]
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    phrases = ["aa", "she", "sea", "he", "hehe", "zzz"]
    out = sorted(
        map(repr, ac_scan(ray.data.from_arrow(docs), phrases).take_all())
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = sorted(
        map(repr, con.sql(ac_scan_sql(phrases)).arrow().to_pylist())
    )
    con.close()
    assert out == exp

    got = {
        (eval(r)["doc_id"], eval(r)["phrase"]): eval(r)["n_matches"]
        for r in out
    }
    assert got[(0, "aa")] == 4          # overlapping: 2 per "aaa" run
    assert got[(4, "he")] == 4
    assert got[(4, "hehe")] == 3        # nested phrase counted too
    assert (0, "zzz") not in got        # no-match phrases absent


def test_ac_differential_random():
    rng = random.Random(7)
    alphabet = "abc"
    phrases = sorted(
        {"".join(rng.choices(alphabet, k=rng.randint(1, 4)))
         for _ in range(12)}
    )
    ac = _Automaton(phrases)
    for _ in range(50):
        text = "".join(rng.choices(alphabet + " ", k=rng.randint(0, 80)))
        counts = ac.count(text)
        for pid, p in enumerate(phrases):
            assert counts.get(pid, 0) == _brute_count(text, p), (text, p)
