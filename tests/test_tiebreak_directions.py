"""Adversarial equal-weight ties: the reference uses OPPOSITE unique_id_l
tie-break directions in its two selection windows — top-n rescore filter
orders (match_weight DESC, unique_id_l DESC)
(identify_distinguishing_tokens.py:52-54) while best-match selection orders
(match_weight DESC, unique_id_l ASC) (analyse_results.py:63-67). These tests
pin BOTH directions with constructed equal-weight groups so a refactor that
'harmonizes' them fails loudly, on every implementation path (row kernel,
ImproveStage table path, best_match_rows)."""

from __future__ import annotations

import pyarrow as pa

from uk_address_matcher_ray.stages.rescore import ImproveStage, rescore_group
from uk_address_matcher_ray.stages.select import best_match_rows


def _pair(uid_l: str, mw: float, addr_l: str = "10 X Y"):
    return {
        "match_weight": mw,
        "match_key": "0",
        "unique_id_l": uid_l,
        "unique_id_r": "r1",
        "original_address_concat_l": addr_l,
        "original_address_concat_r": "10 X Y",
        "common_end_tokens_hist_r": None,
        "postcode_l": "W1A",
        "postcode_r": "W1A",
    }


def test_rescore_topn_keeps_highest_uid_on_ties():
    """5 equal-weight pairs, top_n=3: DESC tie-break keeps l5,l4,l3."""
    rows = [_pair(f"l{i}", 2.0) for i in range(1, 6)]
    out = rescore_group(
        rows, match_weight_threshold=-100, top_n_matches=3, use_bigrams=False
    )
    assert sorted(r["unique_id_l"] for r in out) == ["l3", "l4", "l5"]


def test_rescore_topn_weight_dominates_then_uid_desc():
    """Higher weight wins regardless of uid; among equals uid DESC."""
    rows = [
        _pair("l9", 1.0),
        _pair("l1", 5.0),
        _pair("l2", 1.0),
        _pair("l8", 1.0),
    ]
    out = rescore_group(
        rows, match_weight_threshold=-100, top_n_matches=2, use_bigrams=False
    )
    assert sorted(r["unique_id_l"] for r in out) == ["l1", "l9"]


def test_improve_stage_table_path_matches_row_path_on_ties():
    """The vectorized table path must apply the same DESC tie-break."""
    rows = [_pair(f"l{i}", 3.0, addr_l=f"{i} X Y") for i in range(1, 7)]
    stage = ImproveStage(
        dedup_first=True,
        match_weight_threshold=-100.0,
        top_n_matches=3,
        use_bigrams=True,
    )
    tbl = pa.Table.from_pylist(rows)
    via_table = {r["unique_id_l"] for r in stage.process_table(tbl).to_pylist()}
    via_rows = {r["unique_id_l"] for r in stage.process_table_pydict(tbl).to_pylist()}
    assert via_table == via_rows == {"l4", "l5", "l6"}


def test_best_match_picks_lowest_uid_on_ties():
    """best-match window: ASC tie-break -> l1 wins among equal weights."""
    rows = [_pair(uid, 7.5) for uid in ("l3", "l1", "l2")]
    best = best_match_rows(rows)
    assert len(best) == 1
    assert best[0]["unique_id_l"] == "l1"
    assert best[0]["distinguishability"] == 0.0  # tied runner-up


def test_directions_really_are_opposite():
    """One constructed group, both windows: top-n keeps the HIGH uid,
    best-match then picks the LOW uid among what survives."""
    rows = [_pair(uid, 1.25) for uid in ("l1", "l2", "l3", "l4")]
    kept = rescore_group(
        rows, match_weight_threshold=-100, top_n_matches=2, use_bigrams=False
    )
    assert sorted(r["unique_id_l"] for r in kept) == ["l3", "l4"]
    best = best_match_rows(
        [
            {
                "match_weight": r["match_weight"],
                "unique_id_l": r["unique_id_l"],
                "unique_id_r": r["unique_id_r"],
            }
            for r in kept
        ]
    )
    assert best[0]["unique_id_l"] == "l3"
