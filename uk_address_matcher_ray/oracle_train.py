"""DuckDB oracle for the EM training pass (stages/train.py).

Generates a single standalone SQL statement that mirrors ``em_train``
bit-for-bit: the gamma vectors come from the same blocking + comparison
CASE chains as the scoring oracle; each EM iteration is unrolled as a CTE
pair (quantized E-step aggregate -> single-row pivoted weights). All
probability mass is aggregated as int64 fixed-point (floor(p·2^40 + 0.5)),
matching the engine's order-independent integer sums, so value hashes are
exact regardless of execution order on either side.

Float literals are embedded via repr() (round-trips exactly) computed with
the SAME Python expressions the engine uses (seed_weights -> log2(m/u)).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

from uk_address_matcher_ray.state.model import MatchModel
from uk_address_matcher_ray.stages.train import (
    DEFAULT_FIXED,
    M_U_FLOOR,
    QUANT,
    gamma_levels,
    seed_weights,
)
from uk_address_matcher_ray import oracle_scoring as osc


def _gamma_case(comp) -> str:
    """First-match-wins CASE yielding the engine's gamma numbering."""
    nn = sum(1 for lv in comp.levels if not lv.is_null)
    whens: List[str] = []
    pos = 0
    for lv in comp.levels:
        cond = osc._cond_sql(lv.condition, lv.threshold, comp.name)
        if lv.is_null:
            whens.append(f"WHEN {cond} THEN -1")
        else:
            whens.append(f"WHEN {cond} THEN {nn - 1 - pos}")
            pos += 1
    return "CASE " + " ".join(whens) + " END"


def gamma_pairs_sql(cleaned_union_sql: str, model: MatchModel | None = None) -> str:
    """Deduped blocked pairs with gamma_<comparison> columns (no threshold,
    no TF adjustment — exactly the EM training input)."""
    model = model or MatchModel()
    rule_selects = []
    for rid, rule in enumerate(model.blocking_rules):
        cond = osc._rule_condition(rule)
        rule_selects.append(
            f"SELECT l.unique_id AS uid_l, r.unique_id AS uid_r, {rid} AS rule_id "
            f"FROM cc l JOIN cm r ON {cond}"
        )
    all_rules = "\nUNION ALL\n".join(rule_selects)
    gamma_cols = ",\n        ".join(
        f"({_gamma_case(c)}) AS gamma_{c.name}" for c in model.comparisons
    )
    tok = osc._hist_product_expr(
        "l.token_rel_freq_arr_hist", "r.token_rel_freq_arr_hist"
    )
    cet = osc._hist_product_expr("l.common_end_tokens_hist", "r.common_end_tokens_hist")
    return f"""
WITH cleaned_all AS MATERIALIZED ({cleaned_union_sql}),
cc AS MATERIALIZED (SELECT * FROM cleaned_all WHERE unique_id LIKE 'c%'),
cm AS MATERIALIZED (SELECT * FROM cleaned_all WHERE unique_id LIKE 'm%'),
pairs AS (
    SELECT uid_l, uid_r, min(rule_id) AS match_key
    FROM ({all_rules})
    GROUP BY uid_l, uid_r
),
prods AS (
    SELECT p.uid_l, p.uid_r,
        ({tok}) AS __tok_prod,
        ({cet}) AS __cet_prod,
        {gamma_cols}
    FROM pairs p
    JOIN cc l ON p.uid_l = l.unique_id
    JOIN cm r ON p.uid_r = r.unique_id
)
SELECT * FROM prods
"""


def em_sql(
    cleaned_union_sql: str,
    model: MatchModel | None = None,
    iterations: int = 2,
    fixed_comparisons: Sequence[str] = DEFAULT_FIXED,
) -> str:
    model = model or MatchModel()
    trainable = [c.name for c in model.comparisons if c.name not in fixed_comparisons]
    comps = {c.name: c for c in model.comparisons}
    gammas = {c.name: gamma_levels(c) for c in model.comparisons}

    # seed log2(m/u) literals computed with the engine's exact expressions
    seeds = seed_weights(model, trainable)
    seed_luts: Dict[str, Dict[int, float]] = {
        name: {g: math.log2(m / u) for g, (m, u) in cell.items()}
        for name, cell in seeds.items()
    }
    fixed_luts: Dict[str, Dict[int, float]] = {}
    for comp in model.comparisons:
        if comp.name in trainable:
            continue
        nn = [lv for lv in comp.levels if not lv.is_null]
        cell = {}
        g = len(nn) - 1
        for lv in nn:
            cell[g] = math.log2(lv.bayes_factor)
            g -= 1
        fixed_luts[comp.name] = cell

    def w_expr_literal(luts: Dict[str, Dict[int, float]], prior: str) -> str:
        """Per-pair weight from literal log2(bf) values."""
        terms = [prior]
        for comp in model.comparisons:
            lut = luts[comp.name]
            whens = " ".join(
                f"WHEN {g} THEN CAST({v!r} AS DOUBLE)" for g, v in sorted(lut.items())
            )
            terms.append(
                f"(CASE gamma_{comp.name} {whens} ELSE CAST(0.0 AS DOUBLE) END)"
            )
        return " + ".join(terms)

    def w_expr_from(prev: str) -> str:
        """Per-pair weight where trainable log2(m/u) come from CTE ``prev``
        (single-row pivot) and fixed comparisons stay literal."""
        lam_col = f"{prev}.lam"
        prior = f"log2(({lam_col}) / (1.0 - ({lam_col})))"
        terms = [f"({prior})"]
        for comp in model.comparisons:
            if comp.name in trainable:
                whens = " ".join(
                    f"WHEN {g} THEN log2({prev}.m_{comp.name}_{g} / {prev}.u_{comp.name}_{g})"
                    for g in gammas[comp.name]
                )
            else:
                whens = " ".join(
                    f"WHEN {g} THEN CAST({v!r} AS DOUBLE)"
                    for g, v in sorted(fixed_luts[comp.name].items())
                )
            terms.append(
                f"(CASE gamma_{comp.name} {whens} ELSE CAST(0.0 AS DOUBLE) END)"
            )
        return " + ".join(terms)

    def agg_select(e: str) -> str:
        cols = []
        for name in trainable:
            for g in gammas[name]:
                cols.append(
                    f"sum(CASE WHEN gamma_{name} = {g} THEN pq ELSE 0 END) AS pq_{name}_{g}"
                )
                cols.append(
                    f"sum(CASE WHEN gamma_{name} = {g} THEN {QUANT} - pq ELSE 0 END) AS uq_{name}_{g}"
                )
            cols.append(
                f"sum(CASE WHEN gamma_{name} >= 0 THEN pq ELSE 0 END) AS pden_{name}"
            )
            cols.append(
                f"sum(CASE WHEN gamma_{name} >= 0 THEN {QUANT} - pq ELSE 0 END) AS uden_{name}"
            )
        cols.append("sum(pq) AS tot_pq")
        cols.append("count(*) AS n_pairs")
        return f"SELECT {', '.join(cols)} FROM {e}"

    def weights_select(a: str) -> str:
        cols = []
        for name in trainable:
            for g in gammas[name]:
                cols.append(
                    f"GREATEST(CAST(pq_{name}_{g} AS DOUBLE) / "
                    f"CAST(GREATEST(pden_{name}, 1) AS DOUBLE), {M_U_FLOOR!r}) AS m_{name}_{g}"
                )
                cols.append(
                    f"GREATEST(CAST(uq_{name}_{g} AS DOUBLE) / "
                    f"CAST(GREATEST(uden_{name}, 1) AS DOUBLE), {M_U_FLOOR!r}) AS u_{name}_{g}"
                )
        cols.append(
            f"CAST(tot_pq AS DOUBLE) / CAST({QUANT} * n_pairs AS DOUBLE) AS lam"
        )
        return f"SELECT {', '.join(cols)} FROM {a}"

    lam0 = model.probability_two_random_records_match
    prior0 = math.log2(lam0 / (1.0 - lam0))
    luts0 = dict(seed_luts)
    luts0.update(fixed_luts)

    ctes = [f"gp AS MATERIALIZED ({gamma_pairs_sql(cleaned_union_sql, model)})"]
    for it in range(1, iterations + 1):
        if it == 1:
            w_expr = w_expr_literal(luts0, f"CAST({prior0!r} AS DOUBLE)")
            src = "gp"
        else:
            w_expr = w_expr_from(f"w{it - 1}")
            src = f"gp CROSS JOIN w{it - 1}"
        ctes.append(
            f"e{it} AS (SELECT CAST(floor((1.0 / (1.0 + pow(2.0, -({w_expr})))) "
            f"* {QUANT} + 0.5) AS BIGINT) AS pq, gp.* FROM {src})"
        )
        ctes.append(f"a{it} AS ({agg_select(f'e{it}')})")
        ctes.append(f"w{it} AS ({weights_select(f'a{it}')})")

    K = iterations
    out_rows = []
    for name in trainable:
        for g in gammas[name]:
            out_rows.append(
                f"SELECT '{name}' AS comparison, {g} AS gamma_value, "
                f"m_{name}_{g} AS m_probability, u_{name}_{g} AS u_probability FROM w{K}"
            )
    out_rows.append(
        f"SELECT '__lambda' AS comparison, -1 AS gamma_value, "
        f"lam AS m_probability, CAST(NULL AS DOUBLE) AS u_probability FROM w{K}"
    )
    union = "\nUNION ALL\n".join(out_rows)
    return "WITH " + ",\n".join(ctes) + f"\n{union}"
