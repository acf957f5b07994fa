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
    Returns counts {correct, incorrect, missing}."""
    top = top1_per_messy(pairs_ds).take_all()
    got = {r["unique_id_r"]: r["unique_id_l"] for r in top}
    correct = incorrect = missing = 0
    for mid, truth in labels.items():
        pred = got.get(mid)
        if pred is None:
            missing += 1
        elif pred == truth:
            correct += 1
        else:
            incorrect += 1
    return {"correct": correct, "incorrect": incorrect, "missing": missing}


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
    provided UPRN column. ``messy_uprn``: messy unique_id -> claimed UPRN
    (small; broadcast implicitly via closure capture)."""
    agree = disagree = no_claim = unmatched = 0
    for row in best_ds.select_columns(["unique_id_r", "unique_id_l"]).take_all():
        claimed = messy_uprn.get(row["unique_id_r"])
        got = row["unique_id_l"]
        if got is None:
            unmatched += 1
        elif claimed is None:
            no_claim += 1
        elif str(claimed) == str(got):
            agree += 1
        else:
            disagree += 1
    return {
        "agree": agree,
        "disagree": disagree,
        "no_claim": no_claim,
        "unmatched": unmatched,
    }
