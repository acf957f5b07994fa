"""Hypothesis gate: the vectorized block scorer must be BIT-identical to the
scalar per-pair engine on generated corpora (degenerate postcodes, shared
tokens, flat markers, duplicate addresses...)."""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_cleaning_property import _address, _postcode
from uk_address_matcher_ray.functions.compare import prepare_row, score_pair
from uk_address_matcher_ray.stages import tf as tf_mod
from uk_address_matcher_ray.stages.block import (
    BLOCK_KEY_COL,
    BlockKeyEmitter,
)
from uk_address_matcher_ray.stages.clean import clean_batch
from uk_address_matcher_ray.stages.score import pair_schema
from uk_address_matcher_ray.stages.score_vec import score_pairs_vectorized
from uk_address_matcher_ray.state.model import MatchModel

THRESHOLD = -50.0


@given(
    rows=st.lists(
        st.tuples(_address(), _postcode()), min_size=2, max_size=14
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_vectorized_scorer_matches_scalar(rows):
    model = MatchModel()
    tbl = pa.table(
        {
            "unique_id": pa.array(
                [("c" if i % 2 == 0 else "m") + f"{i:03d}" for i in range(len(rows))],
                pa.string(),
            ),
            "address_concat": pa.array([a for a, _ in rows], pa.string()),
            "postcode": pa.array([p for _, p in rows], pa.string()),
        }
    )
    addrs = tbl.column("address_concat").to_pylist()
    tok_counts, num_counts, end_counts, _ = tf_mod.corpus_token_stats(addrs)
    tf = tf_mod.rel_freq_table(tok_counts)
    numeric_tf = {
        f"numeric_token_{i}": tf_mod.rel_freq_table(num_counts)
        for i in (1, 2, 3)
    }
    cleaned = clean_batch(tbl, tf, frozenset(tf_mod.end_token_set(end_counts)))
    if cleaned.num_rows == 0:
        return
    import pyarrow.compute as pc

    is_l = pc.match_substring_regex(cleaned.column("unique_id"), "^c")
    l_part = cleaned.filter(is_l)
    r_part = cleaned.filter(pc.invert(is_l))
    emitted = pa.concat_tables(
        [
            BlockKeyEmitter(model, 0, {})(l_part),
            BlockKeyEmitter(model, 1, {})(r_part),
        ]
    ).combine_chunks()
    if emitted.num_rows == 0:
        return
    emitted = emitted.sort_by(BLOCK_KEY_COL)

    schema = pair_schema(model, ())
    vec = score_pairs_vectorized(emitted, model, numeric_tf, THRESHOLD, schema)
    vec_out = defaultdict(list)
    for r in vec.to_pylist():
        vec_out[(r["unique_id_l"], r["unique_id_r"], r["match_key"])].append(
            (r["match_weight"], r["match_probability"])
        )

    # scalar reference over the same emitted rows
    by_key_l = defaultdict(list)
    l_rows = {r["unique_id"]: r for r in l_part.to_pylist()}
    r_rows = {r["unique_id"]: r for r in r_part.to_pylist()}
    for rec in emitted.to_pylist():
        if rec["__side"] == 0:
            by_key_l[rec[BLOCK_KEY_COL]].append(rec)
    scalar_out = defaultdict(list)
    for rec in emitted.to_pylist():
        if rec["__side"] != 1:
            continue
        for lrec in by_key_l.get(rec[BLOCK_KEY_COL], []):
            lrow = l_rows[lrec["unique_id"]]
            rrow = r_rows[rec["unique_id"]]
            mw, prob, gammas = score_pair(
                prepare_row(lrow), prepare_row(rrow), model, numeric_tf
            )
            if mw >= THRESHOLD:
                scalar_out[
                    (lrec["unique_id"], rec["unique_id"], lrec["__rule"])
                ].append((mw, prob))

    def canon(d):
        return {k: sorted(v) for k, v in d.items()}

    vec_c, sc_c = canon(vec_out), canon(scalar_out)
    assert set(vec_c) == set(sc_c), (
        f"pairs differ: only_vec={list(set(vec_c)-set(sc_c))[:3]} "
        f"only_scalar={list(set(sc_c)-set(vec_c))[:3]}"
    )
    for k in vec_c:
        assert vec_c[k] == sc_c[k], (k, vec_c[k], sc_c[k])