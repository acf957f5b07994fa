"""Gopher-style repetition stats (stages/repetition.py): vectorized kernel
vs the independent scalar reference (hypothesis differential), the DuckDB
oracle (bit-exact), and the fused filter stage."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray import oracle_extras
from uk_address_matcher_ray.stages.repetition import (
    DEFAULT_THRESHOLDS,
    filter_repetitive,
    repetition_stats_dataset,
    repetition_stats_row,
    repetition_stats_table,
)


def _stats(texts):
    ids = pa.array(range(len(texts)), pa.int64())
    t = repetition_stats_table(
        ids, pa.array(texts, pa.string()), pa.field("doc_id", pa.int64())
    )
    return t.to_pydict()


def test_known_values():
    # 4 kept lines: "a b" x3 (dup), "\tx y" x1; words a b a b x y a b = 8
    out = _stats(["a b\na b\n  \n\tx y\na b"])
    assert out["n_words"] == [8]
    assert out["n_lines"] == [4]
    assert out["dup_line_frac"] == [1.0 - 2 / 4]
    # dup chars: "a b" len 3 x3 occurrences = 9; total = 9 + len("\tx y")=4
    assert out["dup_line_char_frac"] == [9 / 13]
    # 2-gram (a,b) x3, chars 2 -> cov 6 of 8 word chars
    assert out["top_2gram_char_frac"] == [6 / 8]
    # 3-grams: (a,b,a),(b,a,b) each x? sequence a b a b x y a b:
    # grams: aba bab abx bxy xya yab -> no dup -> 0
    assert out["dup_3gram_char_frac"] == [0.0]
    assert out["keep"] == [False]


def test_empty_and_null():
    out = _stats([None, "", "word", "  \t  "])
    assert out["n_words"] == [0, 0, 1, 0]
    assert out["n_lines"] == [0, 0, 1, 0]
    for c in (
        "dup_line_frac",
        "dup_line_char_frac",
        "top_2gram_char_frac",
        "dup_3gram_char_frac",
    ):
        assert out[c] == [0.0] * 4, c
    assert out["keep"] == [True] * 4


def test_full_repetition():
    out = _stats(["r r r r r r"])
    # every 3-gram (r,r,r) occurs 4 times -> all positions covered
    assert out["dup_3gram_char_frac"] == [1.0]
    # top 2-gram (r,r) count 5, chars 2 -> 10/6
    assert out["top_2gram_char_frac"] == [10 / 6]
    assert out["keep"] == [False]


_txt = st.text(
    alphabet=st.sampled_from(list("ab xy\t\n\r\f\x0b.é")), max_size=60
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_txt | st.none(), min_size=1, max_size=8))
def test_differential_vs_scalar(texts):
    out = _stats(texts)
    for i, t in enumerate(texts):
        ref = repetition_stats_row(t)
        for col, v in ref.items():
            assert out[col][i] == v, (col, repr(t))


def test_oracle_bit_exact():
    rng = np.random.default_rng(7)
    vocab = ["data", "the", "merge", "x", "longword", "é"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        for _ in range(40)
    ]
    texts += [None, "", "a b\na b\nc", "r r r r r r r r"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    eng = (
        repetition_stats_table(
            docs.column("doc_id").combine_chunks(),
            docs.column("text"),
            docs.schema.field("doc_id"),
        )
        .sort_by("doc_id")
        .to_pydict()
    )
    con = duckdb.connect()
    con.register("documents", docs)
    ora = (
        con.execute(oracle_extras.repetition_sql())
        .fetch_arrow_table()
        .sort_by("doc_id")
        .to_pydict()
    )
    assert set(eng) == set(ora)
    for col in eng:
        assert eng[col] == ora[col], col


def test_dataset_and_filter(ray_session):
    import ray

    # long-enough distinct-word doc (short docs trivially fail the
    # top-2-gram threshold: one 2-gram covers most of a 3-word doc)
    good = " ".join(f"word{i}" for i in range(40))
    texts = [good] * 3 + ["spam spam spam spam spam"] * 2
    rows = [{"doc_id": i, "text": t, "extra": i * 10} for i, t in enumerate(texts)]
    ds = ray.data.from_items(rows)
    stats = repetition_stats_dataset(ds).take_all()
    by_id = {r["doc_id"]: r for r in stats}
    assert by_id[0]["keep"] is True or by_id[0]["keep"] == True  # noqa: E712
    assert not by_id[4]["keep"]
    kept = filter_repetitive(ds).take_all()
    kept_ids = sorted(r["doc_id"] for r in kept)
    assert kept_ids == sorted(
        r["doc_id"] for r in stats if r["keep"]
    ) == [0, 1, 2]
    # original columns survive the fused filter
    assert {"doc_id", "text", "extra"} <= set(kept[0])


def test_thresholds_override():
    out = repetition_stats_table(
        pa.array([0], pa.int64()),
        pa.array(["r r r r"], pa.string()),
        pa.field("doc_id", pa.int64()),
        thresholds={"dup_3gram_char_frac": 1.0, "top_2gram_char_frac": 2.0},
    ).to_pydict()
    assert out["keep"] == [True]
    assert set(DEFAULT_THRESHOLDS) == {
        "dup_line_frac",
        "dup_line_char_frac",
        "top_2gram_char_frac",
        "dup_3gram_char_frac",
    }
