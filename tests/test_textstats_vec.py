"""Vectorized text-stats kernel (stages/textstats.py text_stats_table) vs
the scalar reference: hypothesis differential incl. non-ASCII fallback
rows, sliced arrays, and the DuckDB oracle."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray import oracle_extras
from uk_address_matcher_ray.stages.textstats import (
    _stats_row,
    text_stats_table,
)

_COLS = [
    "token_count",
    "bpe_token_count",
    "n_chars",
    "alpha_ratio",
    "punct_ratio",
    "mean_token_len",
    "quality",
    "lang_pred",
    "fingerprint",
]


def _check(texts):
    ids = pa.array(range(len(texts)), pa.int64())
    out = text_stats_table(
        ids, pa.array(texts, pa.string()), pa.field("doc_id", pa.int64())
    ).to_pydict()
    for i, t in enumerate(texts):
        for c, v in zip(_COLS, _stats_row(t)):
            assert out[c][i] == v, (c, repr(t))


_txt = st.text(
    alphabet=st.sampled_from(list("the and der die le a_x!. \t\n\r\x0bé2")),
    max_size=50,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_txt | st.none(), min_size=1, max_size=6))
def test_differential_vs_scalar(texts):
    _check(texts)


def test_edges_and_slices():
    texts = [
        None,
        "",
        "   ",
        "the and of to in the",
        "café über the",
        "x" * 300,
        "a b! c? d.",
    ]
    _check(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    sl = tbl.slice(2, 3)
    out = text_stats_table(
        sl.column("doc_id").combine_chunks(),
        sl.column("text"),
        sl.schema.field("doc_id"),
    ).to_pydict()
    for i, t in enumerate(texts[2:5]):
        for c, v in zip(_COLS, _stats_row(t)):
            assert out[c][i] == v, ("slice", c)


def test_oracle_bit_exact():
    texts = [
        "the and of data merge",
        "der die und das ist",
        "one two three four five six seven",
        "",
        None,
        "punct!!! ,,, ___ 123",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    eng = (
        text_stats_table(
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
        con.execute(oracle_extras.text_stats_sql())
        .fetch_arrow_table()
        .sort_by("doc_id")
        .to_pydict()
    )
    for c in _COLS:
        assert eng[c] == ora[c], c
