"""Pairwise Fellegi-Sunter comparison evaluation (SURVEY.md §2.6).

Implements the 8 comparisons of the reference model
(uk_address_matcher/data/splink_model.json) with first-match-wins level
semantics, SQL three-valued logic (NULL comparisons are false), and Splink's
term-frequency adjustment: for a matched level with tf column c and weight w,
BF is multiplied by (u_level / tf)^w where tf is the larger of the two
looked-up term frequencies (falling back to the non-null one; no adjustment
when both are unseen).

Numeric anchors for the whole stack: tests/test_scoring.py reproduces the
committed expected weights in the reference's tests/test_edge_cases.py:94-149.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from uk_address_matcher_ray.functions.text import (
    inward_code,
    levenshtein,
    outward_code,
)
from uk_address_matcher_ray.state.model import Comparison, Level, MatchModel
import re

_DIGIT_RUN = re.compile(r"\d+", re.ASCII)

HistKey = Tuple[str, float]


@dataclass
class ScoreRow:
    """Per-record scoring payload, precomputed once per row (not per pair)."""

    unique_id: str
    original: Optional[str]
    postcode: Optional[str]
    outward: Optional[str]
    inward: Optional[str]
    flat_positional: Optional[str]
    flat_letter: Optional[str]
    nt1: Optional[str]
    nt2: Optional[str]
    nt3: Optional[str]
    nt1_digits: Optional[str]
    tok_hist: Optional[Dict[HistKey, int]]
    cet_hist: Optional[Dict[HistKey, int]]
    tok_hist_sorted: Optional[List[Tuple[HistKey, int]]]
    cet_hist_sorted: Optional[List[Tuple[HistKey, int]]]


def _hist_dict(entries) -> Optional[Dict[HistKey, int]]:
    if entries is None:
        return None
    return {(e["tok"], e["rel_freq"]): e["count"] for e in entries}


def prepare_row(row: dict) -> ScoreRow:
    """Build a ScoreRow from a cleaned-feature record (dict of one row)."""
    nt1 = row.get("numeric_token_1")
    m = _DIGIT_RUN.search(nt1) if nt1 is not None else None
    tok_hist = _hist_dict(row.get("token_rel_freq_arr_hist"))
    cet_hist = _hist_dict(row.get("common_end_tokens_hist"))
    pc = row.get("postcode")
    return ScoreRow(
        unique_id=row["unique_id"],
        original=row.get("original_address_concat"),
        postcode=pc,
        outward=outward_code(pc),
        inward=inward_code(pc),
        flat_positional=row.get("flat_positional"),
        flat_letter=row.get("flat_letter"),
        nt1=nt1,
        nt2=row.get("numeric_token_2"),
        nt3=row.get("numeric_token_3"),
        nt1_digits=(m.group(0) if m else None),
        tok_hist=tok_hist,
        cet_hist=cet_hist,
        tok_hist_sorted=sorted(tok_hist.items()) if tok_hist else None,
        cet_hist_sorted=sorted(cet_hist.items()) if cet_hist else None,
    )


def hist_product(
    l_sorted: Optional[List[Tuple[HistKey, int]]],
    r_hist: Optional[Dict[HistKey, int]],
) -> float:
    """Π over entries of hist_l present in hist_r of rel_freq^min(cnt_l,cnt_r)
    (splink_model.json token_rel_freq_arr_hist level SQL; map keys are
    (tok, rel_freq) structs, so both components must agree)."""
    p = 1.0
    if not l_sorted or not r_hist:
        return p
    for key, cnt_l in l_sorted:
        cnt_r = r_hist.get(key, 0)
        if cnt_r > 0:
            p *= key[1] ** min(cnt_l, cnt_r)
    return p


def _eq(a, b) -> bool:
    return a is not None and b is not None and a == b


def _level_matches(cond: str, thr: Optional[float], cname: str, l: ScoreRow, r: ScoreRow) -> bool:
    if cond == "else":
        return True
    if cond == "exact:original_address_concat":
        return _eq(l.original, r.original)
    if cond == "either_null:original_address_concat":
        return l.original is None or r.original is None
    if cond == "flat_all_null":
        return (
            l.flat_positional is None
            and r.flat_positional is None
            and l.flat_letter is None
            and r.flat_letter is None
        )
    if cond == "exact:flat_positional":
        return _eq(l.flat_positional, r.flat_positional)
    if cond == "exact:flat_letter":
        return _eq(l.flat_letter, r.flat_letter)
    if cond == "flat_letter_vs_numeric_token_1":
        return _eq(l.flat_letter, r.nt1) or _eq(r.flat_letter, l.nt1)
    if cond == "flat_positional_one_side_letter_other":
        return (
            l.flat_positional is not None
            and r.flat_positional is None
            and r.flat_letter is not None
        ) or (
            r.flat_positional is not None
            and l.flat_positional is None
            and l.flat_letter is not None
        )
    if cond == "exact:numeric_token_1":
        return _eq(l.nt1, r.nt1)
    if cond == "either_null:numeric_token_1":
        return l.nt1 is None or r.nt1 is None
    if cond == "digits_equal:numeric_token_1":
        return _eq(l.nt1_digits, r.nt1_digits)
    if cond == "inverted_12":
        return _eq(l.nt2, r.nt1) or _eq(l.nt1, r.nt2)
    if cond == "exact:numeric_token_2":
        return _eq(l.nt2, r.nt2)
    if cond == "both_null:numeric_token_2":
        return l.nt2 is None and r.nt2 is None
    if cond == "either_null:numeric_token_2":
        return l.nt2 is None or r.nt2 is None
    if cond == "exact:numeric_token_3":
        return _eq(l.nt3, r.nt3)
    if cond == "both_null:numeric_token_3":
        return l.nt3 is None and r.nt3 is None
    if cond == "either_null:numeric_token_3":
        return l.nt3 is None or r.nt3 is None
    if cond == "n2l_eq_n3r":
        return _eq(l.nt2, r.nt3)
    if cond == "hist_null":
        if cname == "common_end_tokens":
            return l.cet_hist is None or r.cet_hist is None
        return l.tok_hist is None or r.tok_hist is None
    if cond == "hist_product_lt":
        if cname == "common_end_tokens":
            return hist_product(l.cet_hist_sorted, r.cet_hist) < thr
        return hist_product(l.tok_hist_sorted, r.tok_hist) < thr
    if cond == "both_null:postcode":
        return l.postcode is None and r.postcode is None
    if cond == "exact:postcode":
        return _eq(l.postcode, r.postcode)
    if cond == "postcode_lev1":
        return (
            l.postcode is not None
            and r.postcode is not None
            and levenshtein(l.postcode, r.postcode) <= 1
        )
    if cond == "postcode_lev2":
        return (
            l.postcode is not None
            and r.postcode is not None
            and levenshtein(l.postcode, r.postcode) <= 2
        )
    if cond == "outward_equal":
        return _eq(l.outward, r.outward)
    if cond == "inward_equal":
        return _eq(l.inward, r.inward)
    raise ValueError(f"unknown level condition: {cond}")


def _tf_adjustment(
    level: Level,
    l: ScoreRow,
    r: ScoreRow,
    numeric_tf: Dict[str, Dict[str, float]],
) -> float:
    col = level.tf_column
    lookup = numeric_tf.get(col)
    if lookup is None:
        return 1.0
    val_l = getattr(l, {"numeric_token_1": "nt1", "numeric_token_2": "nt2", "numeric_token_3": "nt3"}[col])
    val_r = getattr(r, {"numeric_token_1": "nt1", "numeric_token_2": "nt2", "numeric_token_3": "nt3"}[col])
    tf_l = lookup.get(val_l) if val_l is not None else None
    tf_r = lookup.get(val_r) if val_r is not None else None
    if tf_l is None and tf_r is None:
        return 1.0
    tf = max(x for x in (tf_l, tf_r) if x is not None)
    return (level.u_probability / tf) ** level.tf_weight


def _compile_condition(cond: str, thr, cname: str):
    """Condition name -> fast closure(l, r) -> bool (same semantics as
    _level_matches, resolved once per model instead of per pair)."""
    if cond == "hist_product_lt":
        if cname == "common_end_tokens":
            return lambda l, r: hist_product(l.cet_hist_sorted, r.cet_hist) < thr
        return lambda l, r: hist_product(l.tok_hist_sorted, r.tok_hist) < thr
    return lambda l, r: _level_matches(cond, thr, cname, l, r)


_FAST_CONDITIONS = {
    "exact:original_address_concat": lambda l, r: _eq(l.original, r.original),
    "either_null:original_address_concat": lambda l, r: l.original is None or r.original is None,
    "flat_all_null": lambda l, r: (
        l.flat_positional is None and r.flat_positional is None
        and l.flat_letter is None and r.flat_letter is None
    ),
    "exact:flat_positional": lambda l, r: _eq(l.flat_positional, r.flat_positional),
    "exact:flat_letter": lambda l, r: _eq(l.flat_letter, r.flat_letter),
    "flat_letter_vs_numeric_token_1": lambda l, r: _eq(l.flat_letter, r.nt1) or _eq(r.flat_letter, l.nt1),
    "exact:numeric_token_1": lambda l, r: _eq(l.nt1, r.nt1),
    "either_null:numeric_token_1": lambda l, r: l.nt1 is None or r.nt1 is None,
    "digits_equal:numeric_token_1": lambda l, r: _eq(l.nt1_digits, r.nt1_digits),
    "inverted_12": lambda l, r: _eq(l.nt2, r.nt1) or _eq(l.nt1, r.nt2),
    "exact:numeric_token_2": lambda l, r: _eq(l.nt2, r.nt2),
    "both_null:numeric_token_2": lambda l, r: l.nt2 is None and r.nt2 is None,
    "either_null:numeric_token_2": lambda l, r: l.nt2 is None or r.nt2 is None,
    "exact:numeric_token_3": lambda l, r: _eq(l.nt3, r.nt3),
    "both_null:numeric_token_3": lambda l, r: l.nt3 is None and r.nt3 is None,
    "either_null:numeric_token_3": lambda l, r: l.nt3 is None or r.nt3 is None,
    "n2l_eq_n3r": lambda l, r: _eq(l.nt2, r.nt3),
    "both_null:postcode": lambda l, r: l.postcode is None and r.postcode is None,
    "exact:postcode": lambda l, r: _eq(l.postcode, r.postcode),
    "outward_equal": lambda l, r: _eq(l.outward, r.outward),
    "inward_equal": lambda l, r: _eq(l.inward, r.inward),
    "else": lambda l, r: True,
}


def _compile_model(model: MatchModel):
    compiled = []
    for comp in model.comparisons:
        nn_count = sum(1 for lv in comp.levels if not lv.is_null)
        levels = []
        pos = 0
        for lv in comp.levels:
            fn = _FAST_CONDITIONS.get(lv.condition) or _compile_condition(
                lv.condition, lv.threshold, comp.name
            )
            gamma = -1 if lv.is_null else nn_count - 1 - pos
            levels.append((fn, lv, gamma))
            if not lv.is_null:
                pos += 1
        compiled.append(tuple(levels))
    return tuple(compiled)


# keyed by id(); the value holds the model reference so the id stays valid
_COMPILED_CACHE: Dict[int, tuple] = {}


def _compiled_for(model: MatchModel):
    entry = _COMPILED_CACHE.get(id(model))
    if entry is None or entry[0] is not model:
        entry = (model, _compile_model(model))
        _COMPILED_CACHE[id(model)] = entry
    return entry[1]


def score_pair_detail(
    l: ScoreRow,
    r: ScoreRow,
    model: MatchModel,
    numeric_tf: Dict[str, Dict[str, float]],
) -> Tuple[float, float, List[dict]]:
    """``score_pair`` with a per-comparison decomposition, for waterfall
    rendering (reference accuracy_from_labels.py:222-283 displays Splink's
    waterfall_chart per pair).

    Returns (match_weight, match_probability, details); details has one dict
    per comparison: {comparison, gamma, condition, bayes_factor (incl. TF
    adjustment), tf_adjustment, log2_bayes_factor}. Contributions are summed
    in model order with Python float addition, so
    prior + Σ log2_bayes_factor == score_pair's match_weight BIT-EXACTLY."""
    compiled = _compiled_for(model)
    log2_bf_total = model.prior_weight
    details: List[dict] = []
    for comp, levels in zip(model.comparisons, compiled):
        gamma = -1
        matched = None
        cond = None
        for fn, lv, g in levels:
            if fn(l, r):
                cond = lv.condition
                if not lv.is_null:
                    matched = lv
                    gamma = g
                break
        bf = 1.0
        tf_adj = 1.0
        contrib = 0.0
        if matched is not None:
            bf = matched.bayes_factor
            if matched.tf_column:
                tf_adj = _tf_adjustment(matched, l, r, numeric_tf)
                bf *= tf_adj
            contrib = math.log2(bf)
            log2_bf_total += contrib
        details.append(
            {
                "comparison": comp.name,
                "gamma": gamma,
                "condition": cond,
                "bayes_factor": bf,
                "tf_adjustment": tf_adj,
                "log2_bayes_factor": contrib,
            }
        )
    mw = log2_bf_total
    prob = 1.0 / (1.0 + 2.0 ** (-mw))
    return mw, prob, details


def score_pair(
    l: ScoreRow,
    r: ScoreRow,
    model: MatchModel,
    numeric_tf: Dict[str, Dict[str, float]],
) -> Tuple[float, float, List[int]]:
    """-> (match_weight, match_probability, gamma values per comparison).

    gamma follows Splink numbering: -1 for the null level, then the first
    non-null level gets the highest value counting down to 0 for ELSE.
    """
    compiled = _compiled_for(model)
    log2_bf_total = model.prior_weight
    gammas: List[int] = []
    for levels in compiled:
        gamma = -1
        matched = None
        for fn, lv, g in levels:
            if fn(l, r):
                if not lv.is_null:
                    matched = lv
                    gamma = g
                break
        gammas.append(gamma)
        if matched is not None:
            bf = matched.bayes_factor
            if matched.tf_column:
                bf *= _tf_adjustment(matched, l, r, numeric_tf)
            log2_bf_total += math.log2(bf)
    mw = log2_bf_total
    prob = 1.0 / (1.0 + 2.0 ** (-mw))
    return mw, prob, gammas
