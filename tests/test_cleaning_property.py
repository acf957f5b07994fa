"""Hypothesis fuzz gate: cleaning fidelity over GENERATED addresses.

The differential tests pin known corpora; this property test explores the
address space (flat markers, punctuation, dashes, unicode-free uppercase/
lowercase mixes, degenerate whitespace) and asserts the engine's cleaning
queue stays byte-identical to the DuckDB oracle on every example. ASCII-only
by design: DuckDB and Python disagree on some unicode case folds (NOTES.md).
"""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_cleaning_oracle import (
    _compare,
    _engine_clean,
    _input_table,
    _oracle_clean,
)

_WORD = st.text(
    alphabet=string.ascii_letters, min_size=1, max_size=9
)
_NUMBER = st.integers(min_value=0, max_value=9999).map(str)
_FLAT = st.sampled_from(
    ["FLAT", "flat", "APARTMENT", "UNIT", "Flat"]
)
_LETTER = st.sampled_from(list(string.ascii_uppercase))
_DASHNUM = st.tuples(_NUMBER, _NUMBER).map(lambda t: f"{t[0]}-{t[1]}")
_PUNCT = st.sampled_from([",", ".", "'", "(", ")", "&", ";", "-"])

_TOKEN = st.one_of(_WORD, _NUMBER, _FLAT, _LETTER, _DASHNUM, _PUNCT)

_SEP = st.sampled_from([" ", "  ", " , ", ", "])


@st.composite
def _address(draw):
    toks = draw(st.lists(_TOKEN, min_size=1, max_size=10))
    seps = [draw(_SEP) for _ in range(len(toks) - 1)] + [""]
    return "".join(t + s for t, s in zip(toks, seps))


@st.composite
def _postcode(draw):
    out = draw(
        st.text(alphabet=string.ascii_uppercase + string.digits, min_size=2, max_size=4)
    )
    inw = draw(
        st.text(alphabet=string.ascii_uppercase + string.digits, min_size=0, max_size=3)
    )
    style = draw(st.integers(0, 3))
    if style == 0:
        return f"{out} {inw}"
    if style == 1:
        return f"{out}{inw}"
    if style == 2:
        return out
    return None


@given(
    rows=st.lists(
        st.tuples(_address(), _postcode()), min_size=1, max_size=12
    )
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_cleaning_matches_oracle_on_generated_addresses(rows):
    tbl = _input_table(
        [(f"u{i:03d}", addr, pc) for i, (addr, pc) in enumerate(rows)]
    )
    _compare(_engine_clean(tbl), _oracle_clean(tbl))
