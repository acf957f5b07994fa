"""Bounded-tile scoring of oversized blocks (the graceful-degradation path
behind salting's blind spot) must be bit-identical to one-shot scoring."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_tiled_scoring_matches_one_shot():
    from tests.corpus import synth_addresses
    from uk_address_matcher_ray.stages.block import (
        BLOCK_KEY_COL,
        BlockKeyEmitter,
        RULE_COL,
        SIDE_COL,
    )
    from uk_address_matcher_ray.stages.clean import clean_batch
    from uk_address_matcher_ray.stages.score import pair_schema
    from uk_address_matcher_ray.stages.score_vec import score_pairs_vectorized
    from uk_address_matcher_ray.stages.tf import (
        corpus_token_stats,
        end_token_set,
        rel_freq_table,
    )
    from uk_address_matcher_ray.state.model import MatchModel

    rows = synth_addresses(240)
    tbl = pa.table(
        {
            "unique_id": pa.array([r[0] for r in rows], pa.string()),
            "address_concat": pa.array([r[1] for r in rows], pa.string()),
            "postcode": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    addrs = tbl.column("address_concat").to_pylist()
    tok_counts, num_counts, end_counts, _ = corpus_token_stats(addrs)
    tf = rel_freq_table(tok_counts)
    numeric_tf = {
        f"numeric_token_{i}": rel_freq_table(num_counts) for i in (1, 2, 3)
    }
    cleaned = clean_batch(tbl, tf, frozenset(end_token_set(end_counts)))

    model = MatchModel()
    half = cleaned.num_rows // 2
    l_emit = BlockKeyEmitter(model, 0, {})(cleaned.slice(0, half))
    r_emit = BlockKeyEmitter(model, 1, {})(cleaned.slice(half))
    both = pa.concat_tables([l_emit, r_emit]).combine_chunks()
    both = both.sort_by(BLOCK_KEY_COL)
    assert both.num_rows > 0

    schema = pair_schema(model, ())
    one_shot = score_pairs_vectorized(
        both, model, numeric_tf, -50.0, schema, max_pairs_per_block=10**9
    )
    tiled = score_pairs_vectorized(
        both, model, numeric_tf, -50.0, schema, max_pairs_per_block=7
    )
    assert one_shot.num_rows > 0

    def canon(t):
        df = t.to_pandas()
        for c in df.columns:
            df[c] = df[c].map(repr)
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    assert canon(one_shot).equals(canon(tiled))
