"""batch_rule_keys_arrays (vectorized Arrow emission) must produce the same
(row, rule, key) triples as the legacy per-row batch_rule_keys, including
null components, short token lists and multi-space postcodes; and
emission_lists must keep the salted-emission MULTISET identical."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.block import (
    BlockKeyEmitter,
    batch_rule_keys,
    batch_rule_keys_arrays,
)
from uk_address_matcher_ray.state.model import MatchModel

_TOK = st.sampled_from(["ALPHA", "BETA", "GAMMA", "", "X1"])
_NUM = st.one_of(st.none(), st.sampled_from(["1", "12", "9A", ""]))
_PC = st.one_of(
    st.none(),
    st.sampled_from(["ZZ1 9AB", "AB12CD", "", " ", "A  B", "ZZ1  9AB "]),
)
_LST = st.one_of(st.none(), st.lists(_TOK, min_size=0, max_size=3))


@st.composite
def _batch(draw):
    n = draw(st.integers(1, 12))
    cols = {
        "unique_id": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "numeric_token_1": pa.array(
            [draw(_NUM) for _ in range(n)], pa.string()
        ),
        "numeric_token_2": pa.array(
            [draw(_NUM) for _ in range(n)], pa.string()
        ),
        "unusual_tokens_arr": pa.array(
            [draw(_LST) for _ in range(n)], pa.list_(pa.string())
        ),
        "very_unusual_tokens_arr": pa.array(
            [draw(_LST) for _ in range(n)], pa.list_(pa.string())
        ),
        "extremely_unusual_tokens_arr": pa.array(
            [draw(_LST) for _ in range(n)], pa.list_(pa.string())
        ),
        "postcode": pa.array([draw(_PC) for _ in range(n)], pa.string()),
    }
    return pa.table(cols)


def _triples(rows, rules, keys):
    keys = keys.to_pylist() if isinstance(keys, (pa.Array, pa.ChunkedArray)) else keys
    return sorted(zip([int(r) for r in rows], [int(r) for r in rules], keys))


@given(batch=_batch())
@settings(max_examples=40, deadline=None)
def test_arrays_match_legacy(batch):
    model = MatchModel()
    for side in (0, 1):
        legacy = batch_rule_keys(batch, model, side)
        vec = batch_rule_keys_arrays(batch, model, side)
        assert _triples(*vec) == _triples(*legacy)


@given(batch=_batch(), seed=st.integers(0, 5))
@settings(max_examples=15, deadline=None)
def test_emission_lists_salted_multiset(batch, seed):
    model = MatchModel()
    # mark some legacy-emitted keys hot with mixed salt shapes
    _r, _u, keys = batch_rule_keys(batch, model, 0)
    hot = {}
    for i, k in enumerate(sorted(set(keys))):
        if (i + seed) % 3 == 0:
            hot[k] = (2, 3) if i % 2 == 0 else 2
        elif (i + seed) % 5 == 0:
            hot[k] = (1, 1)  # degenerate salt: passthrough
    em = BlockKeyEmitter(model, 0, hot_keys_ref=hot)
    take_idx, rules, out_keys = em.emission_lists(batch)

    # legacy expectation: re-run the old per-row salting logic
    from uk_address_matcher_ray.stages.block import SEP, _stable_hash

    exp = []
    uids = batch.column("unique_id").to_pylist()
    for i, rule_id, key in zip(_r, _u, keys):
        salt = hot.get(key)
        if salt is None:
            exp.append((i, rule_id, key))
            continue
        kl, kr = (salt, 1) if isinstance(salt, int) else salt
        if kl <= 1 and kr <= 1:
            exp.append((i, rule_id, key))
            continue
        h = _stable_hash(str(uids[i]))
        li = h % kl
        for rj in range(kr):
            exp.append((i, rule_id, f"{key}{SEP}#{li}|{rj}"))
    got = list(zip([int(x) for x in take_idx], [int(x) for x in rules],
                   out_keys.to_pylist()))
    assert sorted(got) == sorted(exp)


def test_non_string_col_columns_match_legacy():
    """'col:' blocking columns of non-string type must stringify identically
    in both emitters (bools: 'True'/'False', not Arrow's 'true'/'false')."""
    from dataclasses import replace

    from uk_address_matcher_ray.state.model import BlockingRule

    model = replace(
        MatchModel(),
        blocking_rules=(
            BlockingRule(("col:flag", "col:score"), ("col:flag", "col:score")),
        ),
    )
    batch = pa.table(
        {
            "unique_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "flag": pa.array([True, False, None, True], pa.bool_()),
            "score": pa.array([1.5, -0.0, 2.0, None], pa.float64()),
        }
    )
    for side in (0, 1):
        legacy = batch_rule_keys(batch, model, side)
        vec = batch_rule_keys_arrays(batch, model, side)
        assert _triples(*vec) == _triples(*legacy)
        # and the string content really is Python str(): 'True', not 'true'
        assert any("True" in k for k in legacy[2])
