"""Aho-Corasick scan: overlap semantics, nested phrases, differential
vs str-scan brute force, oracle parity."""

import random
import string

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.acscan import (
    _Automaton,
    _ScanStage,
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


def _stage_rows(texts, phrases):
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    stage = _ScanStage(phrases, "doc_id", "text")
    return stage(docs).to_pylist()


def test_ac_vectorized_matches_scalar_and_brute():
    """Lockstep path == scalar automaton == brute force, including the
    scalar-tail branch (one very long doc among short ones), unicode
    (byte-level matching must equal char semantics), and skewed
    lengths."""
    rng = random.Random(11)
    alphabet = "abλ €"  # multi-byte chars stress the UTF-8 argument
    phrases = ["ab", "a", "λ€", "b ab", "λλ", " "]
    texts = []
    for _ in range(60):
        texts.append(
            "".join(rng.choices(alphabet, k=rng.randint(0, 50)))
        )
    texts += [
        "".join(rng.choices(alphabet, k=4000)),  # tail path (few lanes)
        "".join(rng.choices(alphabet, k=3500)),
        "",
        None,
    ]
    rows = _stage_rows(texts, phrases)
    got = {(r["doc_id"], r["phrase"]): r["n_matches"] for r in rows}
    exp = {}
    for did, t in enumerate(texts):
        if not t:
            continue
        for p in phrases:
            c = _brute_count(t, p)
            if c:
                exp[(did, p)] = c
    assert got == exp
    # output ordering contract: (batch row, phrase id) ascending
    pid = {p: i for i, p in enumerate(phrases)}
    keys = [(r["doc_id"], pid[r["phrase"]]) for r in rows]
    assert keys == sorted(keys)


def test_ac_oracle_backslash_and_quote_phrases():
    """sql_str escaping: backslashes and quotes in phrases round-trip
    through the generated oracle SQL."""
    texts = [r"a\b'c a\b", r"\\' x '' \b", None]
    phrases = [r"a\b", "'", r"\\'"]
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    rows = sorted(map(repr, _stage_rows(texts, phrases)))
    con = duckdb.connect()
    con.register("documents", docs)
    exp = sorted(
        map(repr, con.sql(ac_scan_sql(phrases)).arrow().to_pylist())
    )
    con.close()
    assert rows == exp
    assert any("a\\\\b" in r or r"a\b" in r for r in rows)


def test_ac_empty_phrase_rejected():
    with pytest.raises(ValueError):
        ac_scan_sql(["ok", ""])
    with pytest.raises(ValueError):
        _dummy = __import__(
            "uk_address_matcher_ray.stages.acscan", fromlist=["ac_scan"]
        ).ac_scan(None, [""])
