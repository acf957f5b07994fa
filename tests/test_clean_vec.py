"""clean_batch_vec (Arrow/numpy vectorized C5-C11 + T3/P1-P5) must be
bit-identical to the per-row clean_batch spec, including the reference's
quirks: duplicate-end-token slices, the all-digits flat-letter token drop,
histogram NULL-for-empty, the P1 last-3/last-2 asymmetry, and the stable
rel_freq band sort. Adversarial inputs include NUL bytes (vec falls back to
the scalar path), exotic whitespace, and null addresses/postcodes."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.clean import clean_batch
from uk_address_matcher_ray.stages.clean_vec import clean_batch_vec

_WORD = st.sampled_from(
    [
        "HIGH", "STREET", "ST", "ROAD", "RD", "LANE", "AVENUE", "GARDEN",
        "FLAT", "UNIT", "APARTMENT", "BASEMENT", "GROUND", "FLOOR", "TOP",
        "FIRST", "X", "A", "QQQZZZ", "12", "3", "12-14", "C230", "123-A",
        "1A", "99999", "123456", "O'NEIL", "a.b,c", "x/y", "", " ",
    ]
)
_ADDR = st.one_of(
    st.none(),
    st.lists(_WORD, min_size=0, max_size=9).map(" ".join),
    # exotic: tabs/newlines/NUL/unicode
    st.sampled_from(
        [
            "FLAT\t2A  HIGH\nSTREET ST ST",
            "1 X Y X Y",
            "A B A B",
            "Q Q",
            "12 EVIL\x00NUL ROAD",
            "ÜBER STRAßE 7",
            "  GROUND FLOOR FLAT 12 34 HIGH ST  ",
            "UNIT 99 100 DEPOT",
            "APARTMENT 12 34 TOWER",
            "5-7 10A 22B THE MEWS",
        ]
    ),
)
_PC = st.one_of(
    st.none(), st.sampled_from(["ZZ1 9AB", "ab12cd", "AB12CD", "", " ", "A"])
)


@st.composite
def _batch(draw):
    n = draw(st.integers(1, 20))
    return pa.table(
        {
            "unique_id": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "address_concat": pa.array(
                [draw(_ADDR) for _ in range(n)], pa.string()
            ),
            "postcode": pa.array([draw(_PC) for _ in range(n)], pa.string()),
            # a passthrough column to check retained-column plumbing
            "extra": pa.array(list(range(n)), pa.int64()),
        }
    )


_TF = {
    "HIGH": 0.02, "STREET": 0.04, "ST": 0.05, "ROAD": 0.03, "RD": 0.02,
    "LANE": 9e-4, "AVENUE": 8e-5, "GARDEN": 6e-5, "X": 4e-5, "A": 2e-4,
    "QQQZZZ": 5e-8, "12": 1e-3, "3": 2e-3, "FLAT": 0.01, "Q": 9e-8,
    "THE": 0.06, "MEWS": 7e-5, "DEPOT": 3e-8, "TOWER": 9e-5,
}
_END = frozenset({"STREET", "ST", "ROAD", "RD", "LANE", "AVENUE"})


@given(batch=_batch())
@settings(max_examples=60, deadline=None)
def test_vec_matches_row_spec(batch):
    a = clean_batch(batch, _TF, _END)
    b = clean_batch_vec(batch, _TF, _END)
    assert a.schema == b.schema
    assert a.num_rows == b.num_rows
    for name in a.column_names:
        assert a.column(name).to_pylist() == b.column(name).to_pylist(), name


def test_vec_empty_batch():
    batch = pa.table(
        {
            "unique_id": pa.array([], pa.string()),
            "address_concat": pa.array([], pa.string()),
            "postcode": pa.array([], pa.string()),
        }
    )
    a = clean_batch(batch, _TF, _END)
    b = clean_batch_vec(batch, _TF, _END)
    assert a.schema == b.schema and b.num_rows == 0


def test_vec_all_null_addresses():
    batch = pa.table(
        {
            "unique_id": pa.array(["a", "b"], pa.string()),
            "address_concat": pa.array([None, None], pa.string()),
            "postcode": pa.array(["ZZ1 9AB", None], pa.string()),
        }
    )
    a = clean_batch(batch, _TF, _END)
    b = clean_batch_vec(batch, _TF, _END)
    assert a.num_rows == b.num_rows == 0
    assert a.schema == b.schema


@given(batch=_batch())
@settings(max_examples=40, deadline=None)
def test_corpus_stats_vec_matches_row_spec(batch):
    """corpus_token_stats_vec must produce the same four Counters as the
    per-row spec pass, on the same adversarial inputs (NUL routes both
    through the scalar path)."""
    from uk_address_matcher_ray.stages.clean_vec import corpus_token_stats_vec
    from uk_address_matcher_ray.stages.tf import _corpus_token_stats_rows

    addrs = batch.column("address_concat").to_pylist()
    a = _corpus_token_stats_rows(addrs)
    b = corpus_token_stats_vec(batch.column("address_concat"))
    for x, y in zip(a, b):
        assert dict(x) == dict(y)
