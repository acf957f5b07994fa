"""DuckDB oracle for blocking + Fellegi-Sunter scoring + clustering.

Generates SQL from the engine's MatchModel (state/model.py) so the driver can
replay ``predict``-style pairs and connected components in DuckDB at sf=0.01.
Expression order mirrors functions/compare.py exactly (hist product iterates
the sorted l-side histogram; weight sum adds comparisons in model order) so
doubles are bit-identical.
"""

from __future__ import annotations

from typing import List

from uk_address_matcher_ray.state.model import (
    Comparison,
    Level,
    MatchModel,
)

_KEY_EXPR = {
    "n1": "{a}.numeric_token_1",
    "n2": "{a}.numeric_token_2",
    "u1": "list_extract({a}.unusual_tokens_arr, 1)",
    "u2": "list_extract({a}.unusual_tokens_arr, 2)",
    "vu1": "list_extract({a}.very_unusual_tokens_arr, 1)",
    "vu2": "list_extract({a}.very_unusual_tokens_arr, 2)",
    "eu1": "list_extract({a}.extremely_unusual_tokens_arr, 1)",
    "pc": "{a}.postcode",
    "out": "split_part({a}.postcode, ' ', 1)",
    "in": "split_part({a}.postcode, ' ', 2)",
}


def _rule_condition(rule, l_alias: str = "l", r_alias: str = "r") -> str:
    parts = []
    for lk, rk in zip(rule.l_keys, rule.r_keys):
        le = _KEY_EXPR[lk].format(a=l_alias)
        re_ = _KEY_EXPR[rk].format(a=r_alias)
        parts.append(f"{le} = {re_}")
    return " AND ".join(parts)


def _hist_product_expr(l_hist: str, r_hist: str) -> str:
    """Π over sorted l entries present in r of rel_freq^min(count_l, count_r)
    (splink_model.json list_reduce formula over the engine's list<struct>
    encoding; l hist lists are already sorted by (tok, rel_freq))."""
    r_count = (
        f"coalesce(list_filter({r_hist}, "
        f"y -> y.tok = e.tok AND y.rel_freq = e.rel_freq)[1].count, 0)"
    )
    return f"""
    list_reduce(
        list_prepend(CAST(1.0 AS DOUBLE),
            list_filter(
                list_transform({l_hist},
                    e -> CASE WHEN {r_count} > 0
                        THEN POW(e.rel_freq, LEAST(e.count, {r_count}))
                        ELSE NULL END),
                x -> x IS NOT NULL)),
        (p, q) -> p * q)
    """


def _cond_sql(cond: str, thr, cname: str) -> str:
    E = {
        "exact:original_address_concat": "l.original_address_concat = r.original_address_concat",
        "either_null:original_address_concat": "l.original_address_concat IS NULL OR r.original_address_concat IS NULL",
        "flat_all_null": (
            "l.flat_positional IS NULL AND r.flat_positional IS NULL "
            "AND l.flat_letter IS NULL AND r.flat_letter IS NULL"
        ),
        "exact:flat_positional": "l.flat_positional = r.flat_positional",
        "exact:flat_letter": "l.flat_letter = r.flat_letter",
        "flat_letter_vs_numeric_token_1": "l.flat_letter = r.numeric_token_1 OR r.flat_letter = l.numeric_token_1",
        "flat_positional_one_side_letter_other": (
            "(l.flat_positional IS NOT NULL AND r.flat_positional IS NULL AND r.flat_letter IS NOT NULL)"
            " OR (r.flat_positional IS NOT NULL AND l.flat_positional IS NULL AND l.flat_letter IS NOT NULL)"
        ),
        "exact:numeric_token_1": "l.numeric_token_1 = r.numeric_token_1",
        "either_null:numeric_token_1": "l.numeric_token_1 IS NULL OR r.numeric_token_1 IS NULL",
        "digits_equal:numeric_token_1": (
            "nullif(regexp_extract(l.numeric_token_1, '\\d+', 0), '')"
            " = nullif(regexp_extract(r.numeric_token_1, '\\d+', 0), '')"
        ),
        "inverted_12": "l.numeric_token_2 = r.numeric_token_1 OR l.numeric_token_1 = r.numeric_token_2",
        "exact:numeric_token_2": "l.numeric_token_2 = r.numeric_token_2",
        "both_null:numeric_token_2": "l.numeric_token_2 IS NULL AND r.numeric_token_2 IS NULL",
        "either_null:numeric_token_2": "l.numeric_token_2 IS NULL OR r.numeric_token_2 IS NULL",
        "exact:numeric_token_3": "l.numeric_token_3 = r.numeric_token_3",
        "both_null:numeric_token_3": "l.numeric_token_3 IS NULL AND r.numeric_token_3 IS NULL",
        "either_null:numeric_token_3": "l.numeric_token_3 IS NULL OR r.numeric_token_3 IS NULL",
        "n2l_eq_n3r": "l.numeric_token_2 = r.numeric_token_3",
        "both_null:postcode": "l.postcode IS NULL AND r.postcode IS NULL",
        "exact:postcode": "l.postcode = r.postcode",
        "postcode_lev1": "levenshtein(l.postcode, r.postcode) <= 1",
        "postcode_lev2": "levenshtein(l.postcode, r.postcode) <= 2",
        "outward_equal": "split_part(l.postcode, ' ', 1) = split_part(r.postcode, ' ', 1)",
        "inward_equal": "split_part(l.postcode, ' ', 2) = split_part(r.postcode, ' ', 2)",
    }
    if cond == "else":
        return "TRUE"
    if cond == "hist_null":
        if cname == "common_end_tokens":
            return "l.common_end_tokens_hist IS NULL OR r.common_end_tokens_hist IS NULL"
        return "l.token_rel_freq_arr_hist IS NULL OR r.token_rel_freq_arr_hist IS NULL"
    if cond == "hist_product_lt":
        # references the lateral aliases precomputed once per pair row
        col = "__cet_prod" if cname == "common_end_tokens" else "__tok_prod"
        return f"{col} < {thr!r}"
    return E[cond]


def _tf_adj_expr(level: Level) -> str:
    col = level.tf_column
    tf_l, tf_r = f"l.tf_{col}", f"r.tf_{col}"
    tf_val = (
        f"CASE WHEN {tf_l} IS NOT NULL AND {tf_r} IS NOT NULL "
        f"THEN greatest({tf_l}, {tf_r}) ELSE coalesce({tf_l}, {tf_r}) END"
    )
    return (
        f"CASE WHEN {tf_l} IS NULL AND {tf_r} IS NULL THEN CAST(1.0 AS DOUBLE) "
        f"ELSE POW({level.u_probability!r} / ({tf_val}), {level.tf_weight!r}) END"
    )


def _comparison_log2_expr(comp: Comparison) -> str:
    """CASE chain: first matching level wins; null level and no-match -> 0.0."""
    whens: List[str] = []
    for lv in comp.levels:
        cond = _cond_sql(lv.condition, lv.threshold, comp.name)
        if lv.is_null:
            whens.append(f"WHEN {cond} THEN CAST(0.0 AS DOUBLE)")
        else:
            bf = f"CAST({lv.bayes_factor!r} AS DOUBLE)"
            if lv.tf_column:
                bf = f"({bf} * ({_tf_adj_expr(lv)}))"
            whens.append(f"WHEN {cond} THEN log2({bf})")
    return "CASE " + " ".join(whens) + " ELSE CAST(0.0 AS DOUBLE) END"


def _comparison_gamma_expr(comp: Comparison) -> str:
    """Splink gamma numbering (functions/compare.py:_compile_model): -1 for
    the null level, then the first non-null level gets the highest value
    counting down to 0 for ELSE; first matching level wins."""
    nn = sum(1 for lv in comp.levels if not lv.is_null)
    whens: List[str] = []
    pos = 0
    for lv in comp.levels:
        cond = _cond_sql(lv.condition, lv.threshold, comp.name)
        if lv.is_null:
            whens.append(f"WHEN {cond} THEN -1")
        else:
            whens.append(f"WHEN {cond} THEN {nn - 1 - pos}")
            pos += 1
    return "CASE " + " ".join(whens) + " ELSE -1 END"


def waterfall_sql(
    cleaned_union_sql: str,
    numeric_tf_sql: str,
    pairs: List[tuple],
    model: MatchModel | None = None,
) -> str:
    """Waterfall-decomposition oracle (pipelines/report.py:waterfall_rows):
    one row per (pair, bar) with the per-comparison gamma, log2 Bayes factor
    contribution, and the running cumulative weight. The cumulative chain is
    a left-associated addition starting at the prior — the same float order
    the engine uses — so values are bit-identical.

    ``pairs``: either [(pair_id, uid_l, uid_r), ...] literals, or a SQL
    string selecting (pair_id, uid_l, uid_r) — ids present in the cleaned
    union (prefix 'c'/'m' like predict_pairs_sql)."""
    model = model or MatchModel()
    prior = model.prior_weight

    if isinstance(pairs, str):
        sel_cte = f"sel AS ({pairs})"
    else:
        values = ", ".join(f"('{p}', '{l}', '{r}')" for p, l, r in pairs)
        sel_cte = f"sel(pair_id, uid_l, uid_r) AS (VALUES {values})"
    comp_cols = []
    for i, comp in enumerate(model.comparisons):
        comp_cols.append(f"({_comparison_gamma_expr(comp)}) AS g_{i}")
        comp_cols.append(f"({_comparison_log2_expr(comp)}) AS w_{i}")
    comp_cols_sql = ",\n        ".join(comp_cols)

    bars = [
        f"SELECT pair_id, 0 AS bar, 'prior' AS label, -1 AS gamma, "
        f"CAST({prior!r} AS DOUBLE) AS log2_bayes_factor, "
        f"CAST({prior!r} AS DOUBLE) AS cumulative_weight FROM per_pair"
    ]
    cum = f"CAST({prior!r} AS DOUBLE)"
    for i, comp in enumerate(model.comparisons):
        cum = f"{cum} + w_{i}"
        bars.append(
            f"SELECT pair_id, {i + 1} AS bar, '{comp.name}' AS label, "
            f"g_{i} AS gamma, w_{i} AS log2_bayes_factor, "
            f"({cum}) AS cumulative_weight FROM per_pair"
        )
    n = len(model.comparisons)
    bars.append(
        f"SELECT pair_id, {n + 1} AS bar, 'match_weight' AS label, "
        f"-1 AS gamma, CAST(0.0 AS DOUBLE) AS log2_bayes_factor, "
        f"({cum}) AS cumulative_weight FROM per_pair"
    )
    bars_sql = "\nUNION ALL\n".join(bars)

    return f"""
WITH cleaned_all AS MATERIALIZED ({cleaned_union_sql}),
__ntf AS ({numeric_tf_sql}),
with_tf AS MATERIALIZED (
    SELECT c.*, t1.tf_numeric_token AS tf_numeric_token_1,
        t2.tf_numeric_token AS tf_numeric_token_2,
        t3.tf_numeric_token AS tf_numeric_token_3
    FROM cleaned_all c
    LEFT JOIN __ntf t1 ON c.numeric_token_1 = t1.numeric_token
    LEFT JOIN __ntf t2 ON c.numeric_token_2 = t2.numeric_token
    LEFT JOIN __ntf t3 ON c.numeric_token_3 = t3.numeric_token
),
{sel_cte},
per_pair AS (
    SELECT s.pair_id,
        ({_hist_product_expr("l.token_rel_freq_arr_hist", "r.token_rel_freq_arr_hist")}) AS __tok_prod,
        ({_hist_product_expr("l.common_end_tokens_hist", "r.common_end_tokens_hist")}) AS __cet_prod,
        {comp_cols_sql}
    FROM sel s
    JOIN with_tf l ON l.unique_id = s.uid_l
    JOIN with_tf r ON r.unique_id = s.uid_r
)
SELECT pair_id, CAST(bar AS INTEGER) AS bar, label,
    CAST(gamma AS INTEGER) AS gamma, log2_bayes_factor, cumulative_weight
FROM ({bars_sql})
"""


def predict_pairs_sql(
    cleaned_union_sql: str,
    numeric_tf_sql: str,
    model: MatchModel | None = None,
    threshold: float = -50.0,
) -> str:
    """Pairs oracle over a cleaned UNION table whose unique_ids are prefixed
    'c' (canonical) / 'm' (messy).

    Output: (unique_id_l, unique_id_r, match_key, match_weight).
    """
    model = model or MatchModel()

    rule_selects = []
    for rid, rule in enumerate(model.blocking_rules):
        cond = _rule_condition(rule)
        rule_selects.append(
            f"SELECT l.unique_id AS uid_l, r.unique_id AS uid_r, {rid} AS rule_id "
            f"FROM cc l JOIN cm r ON {cond}"
        )
    all_rules = "\nUNION ALL\n".join(rule_selects)

    weight_terms = " + ".join(
        f"({_comparison_log2_expr(c)})" for c in model.comparisons
    )
    prior = model.prior_weight

    return f"""
WITH cleaned_all AS MATERIALIZED ({cleaned_union_sql}),
__ntf AS ({numeric_tf_sql}),
with_tf AS MATERIALIZED (
    SELECT c.*, t1.tf_numeric_token AS tf_numeric_token_1,
        t2.tf_numeric_token AS tf_numeric_token_2,
        t3.tf_numeric_token AS tf_numeric_token_3
    FROM cleaned_all c
    LEFT JOIN __ntf t1 ON c.numeric_token_1 = t1.numeric_token
    LEFT JOIN __ntf t2 ON c.numeric_token_2 = t2.numeric_token
    LEFT JOIN __ntf t3 ON c.numeric_token_3 = t3.numeric_token
),
cc AS MATERIALIZED (SELECT * FROM with_tf WHERE unique_id LIKE 'c%'),
cm AS MATERIALIZED (SELECT * FROM with_tf WHERE unique_id LIKE 'm%'),
pairs AS (
    SELECT uid_l, uid_r, min(rule_id) AS match_key
    FROM ({all_rules})
    GROUP BY uid_l, uid_r
),
scored AS (
    SELECT p.uid_l AS unique_id_l, p.uid_r AS unique_id_r, p.match_key,
        ({_hist_product_expr("l.token_rel_freq_arr_hist", "r.token_rel_freq_arr_hist")}) AS __tok_prod,
        ({_hist_product_expr("l.common_end_tokens_hist", "r.common_end_tokens_hist")}) AS __cet_prod,
        CAST({prior!r} AS DOUBLE) + {weight_terms} AS match_weight
    FROM pairs p
    JOIN cc l ON p.uid_l = l.unique_id
    JOIN cm r ON p.uid_r = r.unique_id
)
SELECT unique_id_l, unique_id_r, match_key, match_weight
FROM scored
WHERE match_weight >= {threshold!r}
"""


def clusters_sql(pairs_sql: str, threshold: float = 5.0) -> str:
    """Connected components over thresholded pairs via recursive min-label
    reachability (nodes prefixed c_/m_ like stages/cluster.py)."""
    return f"""
WITH pairs AS MATERIALIZED ({pairs_sql}),
edges AS (
    SELECT 'c_' || unique_id_l AS src, 'm_' || unique_id_r AS dst
    FROM pairs WHERE match_weight >= {threshold!r}
    UNION ALL
    SELECT 'm_' || unique_id_r AS src, 'c_' || unique_id_l AS dst
    FROM pairs WHERE match_weight >= {threshold!r}
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (
    WITH RECURSIVE r(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, r.label FROM r JOIN edges e ON r.node = e.src
    )
    SELECT * FROM r
)
SELECT node, min(label) AS label FROM reach GROUP BY node
"""
