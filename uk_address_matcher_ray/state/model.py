"""Fellegi-Sunter match model: parameters + blocking-rule specs.

Re-expresses the reference's packaged Splink model
(uk_address_matcher/data/splink_model.json; authored by
linking_model/training.py) as plain dataclasses. Bayes factor per level is
m_probability / u_probability exactly as committed in the JSON (the values
are deliberately unnormalized, SURVEY.md §2.6); level order is
first-match-wins; the null level contributes BF 1.

All numeric constants below are transcribed from splink_model.json (cited
per block) — this is model data, not code, and the engine accepts overrides
via ``MatchModel`` fields / ``from_splink_json``.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class Level:
    """One comparison level: named condition + Bayes factor (+ TF adjustment)."""

    condition: str  # symbolic name dispatched in functions/compare.py
    bayes_factor: float = 1.0
    is_null: bool = False
    tf_column: Optional[str] = None  # numeric_token_{1,2,3}
    tf_weight: float = 0.0
    u_probability: float = 1.0  # used by the TF adjustment (u/tf)^w
    threshold: Optional[float] = None  # for product-ladder levels


@dataclass(frozen=True)
class Comparison:
    name: str
    levels: Tuple[Level, ...]


@dataclass(frozen=True)
class BlockingRule:
    """Conjunction of equalities: l_keys[i] must equal r_keys[i].

    Key names are resolved by stages/block.py's extractors. A NULL component
    on either side means the rule never fires for that row (SQL semantics).
    """

    l_keys: Tuple[str, ...]
    r_keys: Tuple[str, ...]


def _bf(m: float, u: float) -> float:
    return m / u


# token_rel_freq_arr_hist product ladder (splink_model.json:326-618; authored
# by generate_arr_reduce_data, training.py:386-418): thresholds 1e-29..1e4
# with the m-probabilities committed in the JSON.
_HIST_LADDER_M = [
    77935.87748881833, 65536.0, 55108.98747006743, 46340.95001184158,
    38967.93874440916, 32768.0, 27554.493735033717, 23170.47500592079,
    19483.96937220458, 16384.0, 13777.246867516858, 11585.237502960395,
    9741.98468610229, 8192.0, 6888.623433758429, 5792.618751480198,
    4870.992343051145, 4096.0, 2048.0, 1024.0, 512.0, 256.0, 128.0, 64.0,
    32.0, 16.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.25, 0.125, 0.0625,
]
_HIST_LADDER_THRESHOLDS = [10.0 ** e for e in range(-29, 5)]  # 1e-29 .. 1e4


def _hist_ladder_levels() -> Tuple[Level, ...]:
    levels: List[Level] = [Level("hist_null", is_null=True)]
    for thr, m in zip(_HIST_LADDER_THRESHOLDS, _HIST_LADDER_M):
        levels.append(Level("hist_product_lt", bayes_factor=m, threshold=thr))
    levels.append(Level("else", bayes_factor=_bf(1, 256)))
    return tuple(levels)


_EXACT_BF = 95.00950852025916  # 2^6.57 (training.py weights)

DEFAULT_COMPARISONS: Tuple[Comparison, ...] = (
    # splink_model.json:91-119
    Comparison(
        "original_address_concat",
        (
            Level("either_null:original_address_concat", is_null=True),
            Level("exact:original_address_concat", bayes_factor=_bf(15, 1)),
            Level("else", bayes_factor=_bf(1, 2)),
        ),
    ),
    # splink_model.json:120-172
    Comparison(
        "flat_positional",
        (
            Level("flat_all_null", is_null=True),
            Level("exact:flat_positional", bayes_factor=_EXACT_BF),
            Level("exact:flat_letter", bayes_factor=_EXACT_BF),
            Level("flat_letter_vs_numeric_token_1", bayes_factor=1.0),
            Level("flat_positional_one_side_letter_other", bayes_factor=1.0),
            Level("else", bayes_factor=0.03125),
        ),
    ),
    # splink_model.json:173-229
    Comparison(
        "numeric_token_1",
        (
            Level("either_null:numeric_token_1", is_null=True),
            Level(
                "exact:numeric_token_1",
                bayes_factor=_EXACT_BF,
                tf_column="numeric_token_1",
                tf_weight=0.1,
            ),
            Level(
                "digits_equal:numeric_token_1",
                bayes_factor=_EXACT_BF,
                tf_column="numeric_token_1",
                tf_weight=0.1,
            ),
            Level("inverted_12", bayes_factor=4.0),
            Level("either_null:numeric_token_1", bayes_factor=0.0625),
            Level("else", bayes_factor=0.00390625),
        ),
    ),
    # splink_model.json:230-276
    Comparison(
        "numeric_token_2",
        (
            Level("both_null:numeric_token_2", is_null=True),
            Level(
                "exact:numeric_token_2",
                bayes_factor=_EXACT_BF,
                tf_column="numeric_token_2",
                tf_weight=0.1,
            ),
            Level("inverted_12", bayes_factor=1.0),
            Level("either_null:numeric_token_2", bayes_factor=0.25),
            Level("else", bayes_factor=0.0625),
        ),
    ),
    # splink_model.json:277-325
    Comparison(
        "numeric_token_3",
        (
            Level("both_null:numeric_token_3", is_null=True),
            Level(
                "exact:numeric_token_3",
                bayes_factor=_bf(0.6, 0.0001),
                tf_column="numeric_token_3",
                tf_weight=0.5,
                u_probability=0.0001,
            ),
            Level(
                "n2l_eq_n3r",
                bayes_factor=_bf(0.3, 0.0025),
                tf_column="numeric_token_3",
                tf_weight=0.5,
                u_probability=0.0025,
            ),
            Level("either_null:numeric_token_3", bayes_factor=_bf(1, 16)),
            Level("else", bayes_factor=_bf(1, 256)),
        ),
    ),
    # splink_model.json:326-618
    Comparison("token_rel_freq_arr_hist", _hist_ladder_levels()),
    # splink_model.json:619-647
    Comparison(
        "common_end_tokens",
        (
            Level("hist_null", is_null=True),
            Level("hist_product_lt", bayes_factor=4.0, threshold=1e-2),
            Level("else", bayes_factor=_bf(1, 1.5)),
        ),
    ),
    # splink_model.json:648-708
    Comparison(
        "postcode",
        (
            Level("both_null:postcode", is_null=True),
            Level("exact:postcode", bayes_factor=3000000.0),
            Level("postcode_lev1", bayes_factor=10000.0),
            Level("postcode_lev2", bayes_factor=5000.0),
            Level("outward_equal", bayes_factor=3000.0),
            Level("inward_equal", bayes_factor=2000.0),
            Level("else", bayes_factor=_bf(1, 64)),
        ),
    ),
)

# Blocking rules (splink_model.json:16-89), as (l_keys, r_keys) conjunctions.
# Key alphabet: n1/n2 = numeric_token_1/2, u1/u2 = unusual_tokens_arr[1]/[2],
# vu1/vu2 = very_unusual_tokens_arr[1]/[2], eu1 = extremely_unusual_tokens_arr[1],
# pc = postcode, out/in = outward/inward code.
DEFAULT_BLOCKING_RULES: Tuple[BlockingRule, ...] = (
    BlockingRule(("n1", "u1", "u2", "out"), ("n1", "u1", "u2", "out")),   # 0
    BlockingRule(("n1", "u1", "out"), ("n2", "u1", "out")),               # 1
    BlockingRule(("n1", "u1", "in"), ("n2", "u1", "in")),                 # 2
    BlockingRule(("n1", "u1", "u2", "out"), ("n1", "u2", "u1", "out")),   # 3
    BlockingRule(("n1", "u1", "in"), ("n1", "u2", "in")),                 # 4
    BlockingRule(("n1", "pc"), ("n1", "pc")),                             # 5
    BlockingRule(("n1", "pc"), ("n2", "pc")),                             # 6
    BlockingRule(("u1", "pc"), ("u2", "pc")),                             # 7
    BlockingRule(("vu1", "n1"), ("vu1", "n1")),                           # 8
    BlockingRule(("vu1", "n1"), ("vu2", "n1")),                           # 9
    BlockingRule(("n2", "u1", "out"), ("n2", "u1", "out")),               # 10
    BlockingRule(("n1", "u1", "in"), ("n1", "u1", "in")),                 # 11
    BlockingRule(("n2", "u1", "in"), ("n2", "u1", "in")),                 # 12
    BlockingRule(("n2", "pc"), ("n2", "pc")),                             # 13
    BlockingRule(("n1", "n2", "out"), ("n1", "n2", "out")),               # 14
    BlockingRule(("n1", "n2", "in"), ("n1", "n2", "in")),                 # 15
    BlockingRule(("eu1", "out"), ("eu1", "out")),                         # 16
    BlockingRule(("pc",), ("pc",)),                                       # 17
)

PROBABILITY_TWO_RANDOM_RECORDS_MATCH = 3e-8  # splink_model.json:3


@dataclass(frozen=True)
class MatchModel:
    probability_two_random_records_match: float = PROBABILITY_TWO_RANDOM_RECORDS_MATCH
    comparisons: Tuple[Comparison, ...] = DEFAULT_COMPARISONS
    blocking_rules: Tuple[BlockingRule, ...] = DEFAULT_BLOCKING_RULES

    @property
    def prior_weight(self) -> float:
        p = self.probability_two_random_records_match
        return math.log2(p / (1.0 - p))

    def with_blocking_toggles(
        self,
        include_full_postcode_block: bool = True,
        include_outside_postcode_block: bool = True,
    ) -> "MatchModel":
        """splink_model.py:61-76 semantics."""
        if not include_full_postcode_block and not include_outside_postcode_block:
            raise ValueError(
                "At least one of include_full_postcode_block / "
                "include_outside_postcode_block must be True"
            )
        rules = self.blocking_rules
        if not include_full_postcode_block:
            rules = tuple(r for r in rules if r.l_keys != ("pc",))
        if not include_outside_postcode_block:
            rules = (BlockingRule(("pc",), ("pc",)),)
        return replace(self, blocking_rules=rules)

    def with_blocking_on(self, column: str) -> "MatchModel":
        """Single equi-join rule on a raw retained column (tests use
        block_on('test_block'), tests/test_edge_cases.py:48-50)."""
        key = f"col:{column}"
        return replace(self, blocking_rules=(BlockingRule((key,), (key,)),))


def from_splink_json(path: str) -> MatchModel:
    """Load prior + blocking toggles from a splink-shaped JSON; comparison
    *structure* is the engine's (the reference's levels are SQL strings), so
    only the prior is read — comparisons/rules stay at the defaults unless
    overridden in code."""
    with open(path) as f:
        d = json.load(f)
    return MatchModel(
        probability_two_random_records_match=d.get(
            "probability_two_random_records_match", PROBABILITY_TWO_RANDOM_RECORDS_MATCH
        )
    )
