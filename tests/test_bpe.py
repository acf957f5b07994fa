"""Distributed BPE training/apply vs the unrolled-CTE DuckDB oracle.

The oracle restates the whole contract independently in SQL (overlapping
pair counts, max-count/lex-min tie-break, run-parity greedy replacement),
so engine == oracle on randomized corpora checks the semantics, not the
implementation against itself."""

import random

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.bpe import (
    bpe_merges_sql,
    bpe_token_counts,
    bpe_token_counts_sql,
    bpe_train,
    corpus_word_counts,
)


def _ds(texts):
    import ray

    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(3)


def _oracle(texts, sql):
    con = duckdb.connect()
    con.register("documents", pa.table({"text": pa.array(texts, pa.string())}))
    return con.sql(sql).fetchall()


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_and_apply_vs_oracle():
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "aaaa aaa banana bandana",
        "low lower lowest newer newest wider wide",
        "  spaced   out   tokens ",
        "",
    ]
    merges = bpe_train(_ds(texts), num_merges=6)
    want = _oracle(texts, bpe_merges_sql(6))
    assert (
        list(
            zip(
                merges.column("merge_rank").to_pylist(),
                merges.column("lhs").to_pylist(),
                merges.column("rhs").to_pylist(),
                merges.column("pair_count").to_pylist(),
            )
        )
        == want
    )
    got_tok = {
        r["token"]: r["n"]
        for r in bpe_token_counts(_ds(texts), merges).take_all()
    }
    want_tok = dict(_oracle(texts, bpe_token_counts_sql(6)))
    assert got_tok == want_tok


@pytest.mark.usefixtures("ray_session")
def test_bpe_random_property():
    rng = random.Random(3)
    alphabet = "abcx"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(0, 12))
        )
        for _ in range(40)
    ]
    merges = bpe_train(_ds(texts), num_merges=10)
    assert (
        list(
            zip(
                merges.column("merge_rank").to_pylist(),
                merges.column("lhs").to_pylist(),
                merges.column("rhs").to_pylist(),
                merges.column("pair_count").to_pylist(),
            )
        )
        == _oracle(texts, bpe_merges_sql(10))
    )
    got_tok = {
        r["token"]: r["n"]
        for r in bpe_token_counts(_ds(texts), merges).take_all()
    }
    assert got_tok == dict(_oracle(texts, bpe_token_counts_sql(10)))


@pytest.mark.usefixtures("ray_session")
def test_bpe_min_count_floor():
    """The floor drops rare words BEFORE training: merges must equal
    training on the floored word-count table."""
    texts = ["aa bb aa bb aa bb", "rareword", "aa bb"]
    wc = corpus_word_counts(_ds(texts), min_count=2)
    assert "rareword" not in wc and wc == {"aa": 4, "bb": 4}
    merges = bpe_train(_ds(texts), num_merges=2, min_count=2)
    assert merges.column("lhs").to_pylist() == ["a", "b"]
    assert merges.column("rhs").to_pylist() == ["a", "b"]


@pytest.mark.usefixtures("ray_session")
def test_bpe_early_stop_and_empty():
    # single-char words: no pairs -> zero merges, tokens = the chars
    texts = ["a b c a", ""]
    merges = bpe_train(_ds(texts), num_merges=5)
    assert merges.num_rows == 0
    got = {
        r["token"]: r["n"]
        for r in bpe_token_counts(_ds(texts), merges).take_all()
    }
    assert got == {"a": 2, "b": 1, "c": 1}
