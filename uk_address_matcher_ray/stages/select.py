"""Best-match selection with distinguishability (SURVEY.md §2.8).

Re-expresses the reference's ``best_matches_with_distinguishability`` and
``best_matches_summary`` (post_linkage/analyse_results.py:5-191):
per messy record, distinguishability = gap between best and second-best
match weight; categorize against thresholds; LEFT JOIN back to the raw messy
table so unmatched rows appear as '99: No match'.

RD mapping: one ``groupby("unique_id_r").map_groups`` for the window part;
the left join is a groupby over the union of tagged messy rows and best rows
(no join primitive needed; both legs are keyed by the messy unique_id).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa


def categorize(
    distinguishability: Optional[float],
    match_count: int,
    thresholds: Sequence[float],
) -> str:
    """analyse_results.py:54-96 CASE logic (thresholds sorted desc, 0 appended)."""
    thres_sorted = sorted(set(list(thresholds) + [0]), reverse=True)
    next_label = f"{len(thres_sorted) + 2:02d}."
    if match_count == 1:
        return "01: One match only"
    if distinguishability is None:
        return f"{next_label}: NaN (last match in group)"
    for index, d in enumerate(thres_sorted, start=2):
        if distinguishability > d:
            return f"{index:02d}: Distinguishability > {d}"
    if distinguishability == 0:
        return f"{next_label}: Distinguishability = 0"
    return "99: error, uncategorized"


def best_match_rows(
    rows: List[dict],
    thresholds: Sequence[float] = (1, 5, 10),
    best_match_only: bool = True,
) -> List[dict]:
    """Window over one messy record's pairs -> best rows with metrics.

    Tie-break: ORDER BY match_weight DESC, unique_id_l ASC
    (analyse_results.py:63-67 — note opposite direction vs the top-n filter
    in the second pass)."""
    if not rows:
        return []
    srt = sorted(rows, key=lambda r: (-r["match_weight"], r["unique_id_l"]))
    n = len(srt)
    out = []
    for i, r in enumerate(srt):
        d = (
            r["match_weight"] - srt[i + 1]["match_weight"]
            if i + 1 < n
            else None
        )
        rec = {
            "unique_id_r": r["unique_id_r"],
            "unique_id_l": r["unique_id_l"],
            "original_address_concat_l": r.get("original_address_concat_l"),
            "postcode_l": r.get("postcode_l"),
            "match_weight": r["match_weight"],
            "distinguishability": d,
            "match_count": n,
            "distinguishability_category": categorize(d, n, thresholds),
        }
        out.append(rec)
        if best_match_only:
            break
    return out


BEST_SCHEMA = pa.schema(
    [
        pa.field("unique_id_r", pa.string()),
        pa.field("unique_id_l", pa.string()),
        pa.field("address_concat_r", pa.string()),
        pa.field("postcode_r", pa.string()),
        pa.field("original_address_concat_l", pa.string()),
        pa.field("postcode_l", pa.string()),
        pa.field("match_weight", pa.float64()),
        pa.field("distinguishability", pa.float64()),
        pa.field("distinguishability_category", pa.string()),
    ]
)


def best_matches_with_distinguishability(
    pairs_ds,
    messy_raw_ds,
    thresholds: Sequence[float] = (1, 5, 10),
    best_match_only: bool = True,
):
    """Full operator incl. the left join back to the raw messy table."""

    def window(group: pa.Table) -> pa.Table:
        rows = best_match_rows(group.to_pylist(), thresholds, best_match_only)
        cols = {
            "unique_id_r": [r["unique_id_r"] for r in rows],
            "unique_id_l": [r["unique_id_l"] for r in rows],
            "original_address_concat_l": [r["original_address_concat_l"] for r in rows],
            "postcode_l": [r["postcode_l"] for r in rows],
            "match_weight": [r["match_weight"] for r in rows],
            "distinguishability": [r["distinguishability"] for r in rows],
            "distinguishability_category": [
                r["distinguishability_category"] for r in rows
            ],
        }
        return pa.table(
            {
                "unique_id_r": pa.array(cols["unique_id_r"], pa.string()),
                "unique_id_l": pa.array(cols["unique_id_l"], pa.string()),
                "original_address_concat_l": pa.array(
                    cols["original_address_concat_l"], pa.string()
                ),
                "postcode_l": pa.array(cols["postcode_l"], pa.string()),
                "match_weight": pa.array(cols["match_weight"], pa.float64()),
                "distinguishability": pa.array(
                    cols["distinguishability"], pa.float64()
                ),
                "distinguishability_category": pa.array(
                    cols["distinguishability_category"], pa.string()
                ),
            }
        )

    best = pairs_ds.groupby("unique_id_r").map_groups(window, batch_format="pyarrow")

    # Left join raw messy rows (key = unique_id) via union + groupby.
    def tag_messy(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": batch.column("unique_id").cast(pa.string()),
                "__kind": pa.array(["m"] * batch.num_rows, pa.string()),
                "address_concat_r": batch.column("address_concat").cast(pa.string())
                if "address_concat" in batch.column_names
                else pa.nulls(batch.num_rows, pa.string()),
                "postcode_r": batch.column("postcode").cast(pa.string())
                if "postcode" in batch.column_names
                else pa.nulls(batch.num_rows, pa.string()),
                "unique_id_l": pa.nulls(batch.num_rows, pa.string()),
                "original_address_concat_l": pa.nulls(batch.num_rows, pa.string()),
                "postcode_l": pa.nulls(batch.num_rows, pa.string()),
                "match_weight": pa.nulls(batch.num_rows, pa.float64()),
                "distinguishability": pa.nulls(batch.num_rows, pa.float64()),
                "distinguishability_category": pa.nulls(batch.num_rows, pa.string()),
            }
        )

    def tag_best(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": batch.column("unique_id_r"),
                "__kind": pa.array(["b"] * batch.num_rows, pa.string()),
                "address_concat_r": pa.nulls(batch.num_rows, pa.string()),
                "postcode_r": pa.nulls(batch.num_rows, pa.string()),
                "unique_id_l": batch.column("unique_id_l"),
                "original_address_concat_l": batch.column(
                    "original_address_concat_l"
                ),
                "postcode_l": batch.column("postcode_l"),
                "match_weight": batch.column("match_weight"),
                "distinguishability": batch.column("distinguishability"),
                "distinguishability_category": batch.column(
                    "distinguishability_category"
                ),
            }
        )

    both = messy_raw_ds.map_batches(tag_messy, batch_format="pyarrow").union(
        best.map_batches(tag_best, batch_format="pyarrow")
    )

    def join_group(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        m = next((r for r in rows if r["__kind"] == "m"), None)
        bests = [r for r in rows if r["__kind"] == "b"]
        if m is None:
            # best rows with no raw messy row: reference's LEFT JOIN keeps
            # only raw-side rows; drop.
            return BEST_SCHEMA.empty_table()
        out = []
        if not bests:
            out.append(
                {
                    "unique_id_r": m["__key"],
                    "unique_id_l": None,
                    "address_concat_r": m["address_concat_r"],
                    "postcode_r": m["postcode_r"],
                    "original_address_concat_l": None,
                    "postcode_l": None,
                    "match_weight": None,
                    "distinguishability": None,
                    "distinguishability_category": "99: No match",
                }
            )
        for b in bests:
            out.append(
                {
                    "unique_id_r": m["__key"],
                    "unique_id_l": b["unique_id_l"],
                    "address_concat_r": m["address_concat_r"],
                    "postcode_r": m["postcode_r"],
                    "original_address_concat_l": b["original_address_concat_l"],
                    "postcode_l": b["postcode_l"],
                    "match_weight": b["match_weight"],
                    "distinguishability": b["distinguishability"],
                    "distinguishability_category": b["distinguishability_category"],
                }
            )
        return pa.Table.from_pylist(out, schema=BEST_SCHEMA)

    return both.groupby("__key").map_groups(join_group, batch_format="pyarrow")


def best_matches_summary(best_ds):
    """Category counts + percentage (analyse_results.py:119-163)."""
    counts = best_ds.groupby("distinguishability_category").count()
    rows = counts.take_all()
    total = sum(r["count()"] for r in rows)
    rows.sort(key=lambda r: r["distinguishability_category"])
    return pa.table(
        {
            "distinguishability_category": pa.array(
                [r["distinguishability_category"] for r in rows], pa.string()
            ),
            "count": pa.array([r["count()"] for r in rows], pa.int64()),
            "percentage": pa.array(
                [f"{100.0 * r['count()'] / total:.2f}%" for r in rows], pa.string()
            ),
        }
    )


def best_matches_summary_binned(best_ds):
    """B2 variant (analyse_results.py:165-189): counts grouped by
    distinguishability category × match-weight bin."""

    def add_bin(batch: pa.Table) -> pa.Table:
        bins = []
        for w in batch.column("match_weight").to_pylist():
            if w is None:
                bins.append("Unknown")
            elif w < -20:
                bins.append("00. mw < -20")
            elif w < -10:
                bins.append("01. -20 to -10")
            elif w < 0:
                bins.append("02. -10 to 0")
            elif w < 10:
                bins.append("03. 0 to 10")
            elif w < 20:
                bins.append("04. 10 to 20")
            else:
                bins.append("05. mw > 20")
        return batch.append_column(
            "match_weight_bin_label", pa.array(bins, pa.string())
        )

    counts = (
        best_ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["distinguishability_category", "match_weight_bin_label"])
        .count()
    )
    rows = counts.take_all()
    total = sum(r["count()"] for r in rows)
    rows.sort(
        key=lambda r: (
            r["distinguishability_category"],
            r["match_weight_bin_label"],
        )
    )
    return pa.table(
        {
            "distinguishability_category": pa.array(
                [r["distinguishability_category"] for r in rows], pa.string()
            ),
            "match_weight_bin_label": pa.array(
                [r["match_weight_bin_label"] for r in rows], pa.string()
            ),
            "count": pa.array([r["count()"] for r in rows], pa.int64()),
            "percentage": pa.array(
                [f"{100.0 * r['count()'] / total:.2f}%" for r in rows],
                pa.string(),
            ),
        }
    )
