"""Second-pass rescoring semantics vs the reference's bigram unit tests
(tests/test_bigrams.py:155-246 — exact expected map contents)."""

from __future__ import annotations

from uk_address_matcher_ray.stages.rescore import rescore_group


def _pairs(messy: str, canonicals, common_end_token=None):
    cet_hist = (
        [{"tok": common_end_token, "rel_freq": 0.0004, "count": 1}]
        if common_end_token
        else None
    )
    return [
        {
            "match_weight": 0.0,
            "match_probability": 0.5,
            "unique_id_l": f"l{i}",
            "unique_id_r": "r1",
            "original_address_concat_l": addr,
            "original_address_concat_r": messy,
            "common_end_tokens_hist_r": cet_hist,
            "postcode_l": "W1A",
            "postcode_r": "W1A",
        }
        for i, addr in enumerate(canonicals, start=1)
    ]


def _run(messy, canonicals, common_end_token=None):
    out = rescore_group(
        _pairs(messy, canonicals, common_end_token),
        match_weight_threshold=-100,
        top_n_matches=5,
        use_bigrams=True,
    )
    return {r["unique_id_l"]: r for r in out}


def _m(rec, col, bigram=False):
    return {
        (tuple(e["key"]) if bigram else e["key"]): e["value"] for e in rec[col]
    }


def test_scenario_one():
    res = _run("10 X Y Z", ["10 X Y Z", "9 X Y Z"], common_end_token="D")
    r1 = res["l1"]
    assert _m(r1, "overlapping_tokens_this_l_and_r")["10"] == 1
    assert _m(r1, "overlapping_bigrams_this_l_and_r_filtered", True)[("10", "X")] == 1
    r2 = res["l2"]
    assert _m(r2, "tokens_elsewhere_in_block_but_not_this")["10"] == 1


def test_scenario_two():
    res = _run(
        "9 A B C D",
        ["9 A C D", "9 B C D", "8 B A C D Z"],
        common_end_token="D",
    )
    r1 = res["l1"]
    ov = _m(r1, "overlapping_tokens_this_l_and_r")
    assert ov["A"] == 2
    assert ov["9"] == 2
    assert "D" not in ov  # stripped from messy side as common end token
    assert _m(r1, "overlapping_bigrams_this_l_and_r_filtered", True)[("9", "A")] == 1
    r2 = res["l2"]
    assert _m(r2, "overlapping_bigrams_this_l_and_r_filtered", True)[("B", "C")] == 1
    r3 = res["l3"]
    assert (
        _m(r3, "bigrams_elsewhere_in_block_but_not_this_filtered", True)[("9", "A")]
        == 1
    )


def test_scenario_three():
    res = _run(
        "1 HIGH STREET BOVINGDON",
        ["1 HIGH STREET BOVINGDON", "THE ANNEXE 1 HIGH STREET BOVINGDON"],
    )
    r1 = res["l1"]
    ov = _m(r1, "overlapping_tokens_this_l_and_r")
    assert ov["HIGH"] == 2
    assert ov["STREET"] == 2
    r2 = res["l2"]
    assert r2["missing_tokens"] == ["THE", "ANNEXE"]


def test_adjustment_formula():
    """mw_adjustment arithmetic (identify_distinguishing_tokens.py:376-441)."""
    res = _run("10 X Y Z", ["10 X Y Z", "9 X Y Z"], common_end_token="D")
    r1 = res["l1"]
    ov = _m(r1, "overlapping_tokens_this_l_and_r")
    elsewhere = _m(r1, "tokens_elsewhere_in_block_but_not_this")
    ov_bg_f = _m(r1, "overlapping_bigrams_this_l_and_r_filtered", True)
    el_bg_f = _m(r1, "bigrams_elsewhere_in_block_but_not_this_filtered", True)
    expected = (
        3.0 * sum(1 / v**2 for v in ov.values())
        - 1.5 * len(elsewhere)
        - 0.1 * len(r1["missing_tokens"])
        + 3.0 * sum(1 / v**2 for v in ov_bg_f.values())
        - 1.5 * len(el_bg_f)
    )
    assert abs(r1["mw_adjustment"] - expected) < 1e-12
    assert abs(r1["match_weight"] - (0.0 + expected)) < 1e-12
