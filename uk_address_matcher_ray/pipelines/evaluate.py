"""Evaluation vs labels (SURVEY.md §2.9) + pairwise-F1 cluster agreement.

E1: top-1 per messy record joined to a label table
(post_linkage/accuracy_from_labels.py:294-365): counts of correct/incorrect.

Pairwise F1 (BASELINE.json metric): precision/recall over unordered
same-cluster pairs restricted to labeled nodes, computed from two label
assignments (predicted clusters vs truth clusters).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, Tuple

import pyarrow as pa


def top1_per_messy(pairs_ds):
    """ROW_NUMBER() = 1 per unique_id_r ordered by match_weight desc,
    tie-break unique_id_l asc (accuracy_from_labels.py:329-335)."""

    def top1(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        best = min(rows, key=lambda r: (-r["match_weight"], r["unique_id_l"]))
        return pa.table(
            {
                "unique_id_r": pa.array([best["unique_id_r"]], pa.string()),
                "unique_id_l": pa.array([best["unique_id_l"]], pa.string()),
                "match_weight": pa.array([best["match_weight"]], pa.float64()),
            }
        )

    return pairs_ds.groupby("unique_id_r").map_groups(top1, batch_format="pyarrow")


def accuracy_vs_labels(pairs_ds, labels: Dict[str, str]) -> Dict[str, int]:
    """labels: messy unique_id -> correct canonical unique_id (F6 shape).
    Returns counts {correct, incorrect, missing}.

    The label dict is broadcast and per-batch partial counts are summed —
    the (input-sized) top-1 table never collects to the driver; a label
    with no top-1 row is ``missing`` (len(labels) - matched)."""
    import ray

    labels_ref = ray.put(dict(labels))

    def counts(batch: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.util import get_broadcast

        lab = get_broadcast(labels_ref)
        correct = incorrect = 0
        for rid, lid in zip(
            batch.column("unique_id_r").to_pylist(),
            batch.column("unique_id_l").to_pylist(),
        ):
            truth = lab.get(rid)
            if truth is None:
                continue
            if lid == truth:
                correct += 1
            else:
                incorrect += 1
        return pa.table(
            {
                "correct": pa.array([correct], pa.int64()),
                "incorrect": pa.array([incorrect], pa.int64()),
            }
        )

    parts = (
        top1_per_messy(pairs_ds)
        .map_batches(counts, batch_format="pyarrow")
        .take_all()
    )
    correct = sum(r["correct"] for r in parts)
    incorrect = sum(r["incorrect"] for r in parts)
    return {
        "correct": correct,
        "incorrect": incorrect,
        "missing": len(labels) - correct - incorrect,
    }


def pairwise_f1(
    predicted: Dict[str, str], truth: Dict[str, str]
) -> Tuple[float, float, float]:
    """-> (precision, recall, f1) over unordered same-cluster node pairs.

    Computed without materialising pairs: for two clusterings restricted to
    the common node set, pair counts come from cluster sizes and the
    contingency of (pred_label, true_label) — O(n) memory.
    """
    nodes = [n for n in predicted if n in truth]
    pred_sizes: Dict[str, int] = defaultdict(int)
    true_sizes: Dict[str, int] = defaultdict(int)
    joint: Dict[Tuple[str, str], int] = defaultdict(int)
    for n in nodes:
        pred_sizes[predicted[n]] += 1
        true_sizes[truth[n]] += 1
        joint[(predicted[n], truth[n])] += 1

    def pairs(c: Iterable[int]) -> int:
        return sum(x * (x - 1) // 2 for x in c)

    p_pairs = pairs(pred_sizes.values())
    t_pairs = pairs(true_sizes.values())
    both = pairs(joint.values())
    precision = both / p_pairs if p_pairs else 1.0
    recall = both / t_pairs if t_pairs else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return precision, recall, f1


def uprn_agreement(best_ds, messy_uprn: Dict[str, str]) -> Dict[str, int]:
    """E4 (examples/match_epc_to_os.py:149-186): agreement between the
    engine's best match (unique_id_l = gazetteer UPRN) and a messy-side
    provided UPRN column. ``messy_uprn``: messy unique_id -> claimed UPRN,
    broadcast via ``ray.put``; per-batch partial counts are summed so the
    (input-sized) best-match table never collects to the driver."""
    import ray

    claim_ref = ray.put(dict(messy_uprn))
    keys = ("agree", "disagree", "no_claim", "unmatched")

    def counts(batch: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.util import get_broadcast

        claims = get_broadcast(claim_ref)
        c = dict.fromkeys(keys, 0)
        for rid, got in zip(
            batch.column("unique_id_r").to_pylist(),
            batch.column("unique_id_l").to_pylist(),
        ):
            claimed = claims.get(rid)
            if got is None:
                c["unmatched"] += 1
            elif claimed is None:
                c["no_claim"] += 1
            elif str(claimed) == str(got):
                c["agree"] += 1
            else:
                c["disagree"] += 1
        return pa.table({k: pa.array([c[k]], pa.int64()) for k in keys})

    parts = (
        best_ds.select_columns(["unique_id_r", "unique_id_l"])
        .map_batches(counts, batch_format="pyarrow")
        .take_all()
    )
    return {k: sum(r[k] for r in parts) for k in keys}


def _filter_eq(ds, conditions: Dict[str, str]):
    """Equality filter via an Arrow compute mask — ids come from external
    data, so they are never interpolated into a filter-expression string
    (a quote or operator in an id would break the expression or select the
    wrong rows)."""

    def mask(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = None
        for col, val in conditions.items():
            eq = pc.equal(batch.column(col), pa.scalar(val, pa.string()))
            eq = pc.fill_null(eq, False)
            m = eq if m is None else pc.and_(m, eq)
        return batch.filter(m)

    return ds.map_batches(mask, batch_format="pyarrow")


def inspect_match_results(
    improved_ds,
    best_ds,
    labels: Dict[str, str],
    *,
    cleaned_messy_ds=None,
    cleaned_canonical_ds=None,
    unique_id_r: str | None = None,
    example_number: int = 1,
) -> Dict | None:
    """E2 diagnostic drill-down for one messy record (reference
    post_linkage/accuracy_from_labels.py:30-291, inspect_match_results_vs_labels).

    * ``improved_ds``: second-pass output (stages/rescore.py schema, with the
      token/bigram diagnostic columns);
    * ``best_ds``: best_matches_with_distinguishability output;
    * ``labels``: messy unique_id -> correct canonical unique_id.

    When ``unique_id_r`` is None the ``example_number``-th FALSE POSITIVE
    (best match != label, ordered by unique_id_r) is selected, like the
    reference. Returns a dict with the report text plus structured rows
    (header, candidates, cleaned rows); None when nothing qualifies.
    Distributed filters gather only the one record's rows to the driver —
    this is a debugging surface, not a bulk operator.
    """
    target = unique_id_r
    if target is None:
        rows = best_ds.select_columns(
            ["unique_id_r", "unique_id_l"]
        ).take_all()
        fps = sorted(
            r["unique_id_r"]
            for r in rows
            if labels.get(r["unique_id_r"]) is not None
            and r["unique_id_l"] != labels[r["unique_id_r"]]
        )
        if len(fps) < example_number:
            return None
        target = fps[example_number - 1]

    correct_id = labels.get(target)

    best_rows = _filter_eq(best_ds, {"unique_id_r": target}).take_all()
    if not best_rows:
        return None
    best = best_rows[0]

    cand_rows = _filter_eq(improved_ds, {"unique_id_r": target}).take_all()
    cand_rows.sort(key=lambda r: (-r["match_weight"], r["unique_id_l"]))
    cand_rows = cand_rows[:10]

    true_row = next(
        (r for r in cand_rows if r["unique_id_l"] == correct_id), None
    )
    if true_row is None and correct_id is not None:
        found = _filter_eq(
            improved_ds, {"unique_id_r": target, "unique_id_l": correct_id}
        ).take_all()
        true_row = found[0] if found else None

    dist = best.get("distinguishability")
    header = {
        "unique_id_r": target,
        "messy_address": best.get("address_concat_r"),
        "messy_postcode": best.get("postcode_r"),
        "best_match_id": best.get("unique_id_l"),
        "best_match_address": best.get("original_address_concat_l"),
        "best_match_postcode": best.get("postcode_l"),
        "best_match_weight": best.get("match_weight"),
        "true_match_id": correct_id,
        "true_match_weight": (
            true_row["match_weight"] if true_row else float("-inf")
        ),
        "true_match_address": (
            true_row.get("original_address_concat_l") if true_row else "NOT SCORED"
        ),
        "distinguishability": dist,
        "is_false_positive": (
            correct_id is not None and best.get("unique_id_l") != correct_id
        ),
    }

    candidates = [
        {
            "address_concat_l": (
                ("OK " if r["unique_id_l"] == correct_id else "")
                + (r.get("original_address_concat_l") or "")
            ),
            "final_score": r["match_weight"],
            "splink_score": r.get("match_weight_original"),
            "adjustment_score": r.get("mw_adjustment"),
            "matching_tokens": r.get("overlapping_tokens_this_l_and_r"),
            "penalty_tokens": r.get("tokens_elsewhere_in_block_but_not_this"),
            "missing_tokens": r.get("missing_tokens"),
            "matching_bigrams": r.get("overlapping_bigrams_this_l_and_r_filtered"),
            "penalty_bigrams": r.get(
                "bigrams_elsewhere_in_block_but_not_this_filtered"
            ),
            "canonical_id": r["unique_id_l"],
        }
        for r in cand_rows
    ]

    cleaned = {}
    if cleaned_messy_ds is not None:
        got = _filter_eq(cleaned_messy_ds, {"unique_id": target}).take_all()
        if got:
            cleaned["messy"] = got[0]
    if cleaned_canonical_ds is not None:
        for role, uid in (("best_match", best.get("unique_id_l")), ("true_match", correct_id)):
            if uid:
                got = _filter_eq(cleaned_canonical_ds, {"unique_id": uid}).take_all()
                if got:
                    cleaned[role] = got[0]

    report = (
        "=" * 75
        + f"\nunique_id_r:                  {target}"
        + f"\nMessy address:                {header['messy_address']} {header['messy_postcode'] or ''}"
        + f"\nBest match (score: {header['best_match_weight']:,.2f}):  "
        + f"{header['best_match_address']} {header['best_match_postcode'] or ''} (ID: {header['best_match_id']})"
        + f"\nTrue match (score: {header['true_match_weight']:,.2f}):  "
        + f"{header['true_match_address']} (ID: {header['true_match_id']})"
        + "\nDistinguishability:           "
        + (f"{dist:,.2f}" if dist is not None else "N/A")
        + "\n"
        + "=" * 75
    )

    return {
        "header": header,
        "candidates": candidates,
        "cleaned": cleaned,
        "report": report,
    }
