"""min_token_count floor: only sub-floor tokens drop; survivors bit-exact."""

from __future__ import annotations

import pyarrow as pa

import ray

from tests.corpus import synth_addresses


def _rows(n=200):
    return synth_addresses(n)


def _ds(rows):
    tbl = pa.table(
        {
            "unique_id": pa.array([r[0] for r in rows], pa.string()),
            "address_concat": pa.array([r[1] for r in rows], pa.string()),
            "postcode": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)


def test_tf_floor_only_drops_subfloor_tokens():
    from uk_address_matcher_ray.stages.tf import (
        collect_corpus_stats,
        corpus_token_stats,
    )

    FLOOR = 3
    rows = _rows()
    tf0, num0, end0 = collect_corpus_stats(_ds(rows))
    tf3, num3, end3 = collect_corpus_stats(_ds(rows), min_token_count=FLOOR)

    # ground-truth global counts from the local single-pass counter
    tok_counts, num_counts, _end, _nt = corpus_token_stats(
        [r[1] for r in rows]
    )

    assert end3 == end0  # end tokens have their own floor; unaffected
    for floored, full, counts in (
        (tf3, tf0, tok_counts),
        (num3, num0, num_counts),
    ):
        assert set(floored) <= set(full)
        dropped = set(full) - set(floored)
        assert dropped, "test corpus should have a sub-floor tail"
        for t in floored:
            # survivors carry the identical double (same denominator)
            assert floored[t] == full[t]
            assert counts[t] >= FLOOR
        for t in dropped:
            assert counts[t] < FLOOR


def test_tf_floor_auto_below_trigger_bit_identical(monkeypatch):
    """auto mode with the vocabulary below the trigger = floor 0 exactly."""
    from uk_address_matcher_ray.stages.tf import collect_corpus_stats

    rows = _rows()
    tf0, num0, end0 = collect_corpus_stats(_ds(rows))
    tfa, numa, enda = collect_corpus_stats(_ds(rows), min_token_count="auto")
    assert tfa == tf0 and numa == num0 and enda == end0


def test_tf_floor_auto_above_trigger_engages(monkeypatch):
    """Tiny trigger forces the floor on: result == explicit-floor run."""
    from uk_address_matcher_ray.stages.tf import collect_corpus_stats

    monkeypatch.setenv("GRAFT_TF_FLOOR_TRIGGER", "1")
    monkeypatch.setenv("GRAFT_TF_FLOOR", "3")
    rows = _rows()
    tfa, numa, enda = collect_corpus_stats(_ds(rows), min_token_count="auto")
    monkeypatch.delenv("GRAFT_TF_FLOOR_TRIGGER")
    monkeypatch.delenv("GRAFT_TF_FLOOR")
    tf3, num3, end3 = collect_corpus_stats(_ds(rows), min_token_count=3)
    assert tfa == tf3 and numa == num3 and enda == end3
