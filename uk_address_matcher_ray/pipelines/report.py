"""Diagnostic report rendering: waterfall + tuning-history charts.

The reference surfaces two charts in its diagnostic workflow:

* a per-pair **waterfall chart** of match-weight contributions
  (post_linkage/accuracy_from_labels.py:222-283 renders Splink's
  ``linker.visualisations.waterfall_chart`` for best-match and true-match
  pairs), and
* a **tuning-history chart** of score/parameter trajectories
  (scripts/improve_parameters_using_gradient_descent.py:486-520, Altair
  line+text small multiples over the iteration history).

This container has no chart library (Altair/matplotlib are absent), so both
are rendered as deterministic, dependency-free SVG strings — the DATA side
(the decomposition table / long-format history) is the tested contract, and
the SVG is a faithful presentation of exactly those rows. The waterfall
decomposition reuses the scorer's compiled comparison levels
(functions/compare.py:score_pair_detail), so the bar sum reproduces the
pipeline's match weight bit-exactly.
"""

from __future__ import annotations

import xml.sax.saxutils as _sx
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from uk_address_matcher_ray.functions.compare import (
    prepare_row,
    score_pair_detail,
)
from uk_address_matcher_ray.state.model import MatchModel

WATERFALL_SCHEMA = pa.schema(
    [
        pa.field("bar", pa.int32()),
        pa.field("label", pa.string()),
        pa.field("comparison", pa.string()),
        pa.field("gamma", pa.int32()),
        pa.field("condition", pa.string()),
        pa.field("bayes_factor", pa.float64()),
        pa.field("tf_adjustment", pa.float64()),
        pa.field("log2_bayes_factor", pa.float64()),
        pa.field("cumulative_weight", pa.float64()),
    ]
)


def waterfall_rows(
    l_row: dict,
    r_row: dict,
    model: Optional[MatchModel] = None,
    numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
) -> pa.Table:
    """Decompose ONE (cleaned_l, cleaned_r) pair's match weight.

    Rows: ``prior`` (the model's prior partial weight), one bar per
    comparison in model order, and a terminal ``match_weight`` row whose
    ``cumulative_weight`` equals ``score_pair``'s output exactly (same
    compiled conditions, same Python-float addition order)."""
    model = model or MatchModel()
    mw, _prob, details = score_pair_detail(
        prepare_row(l_row), prepare_row(r_row), model, numeric_tf or {}
    )
    rows = [
        {
            "bar": 0,
            "label": "prior",
            "comparison": "prior",
            "gamma": -1,
            "condition": None,
            "bayes_factor": 2.0 ** model.prior_weight,
            "tf_adjustment": 1.0,
            "log2_bayes_factor": model.prior_weight,
            "cumulative_weight": model.prior_weight,
        }
    ]
    cum = model.prior_weight
    for i, d in enumerate(details):
        cum += d["log2_bayes_factor"]
        rows.append(
            {
                "bar": i + 1,
                "label": d["comparison"],
                "comparison": d["comparison"],
                "gamma": d["gamma"],
                "condition": d["condition"],
                "bayes_factor": d["bayes_factor"],
                "tf_adjustment": d["tf_adjustment"],
                "log2_bayes_factor": d["log2_bayes_factor"],
                "cumulative_weight": cum,
            }
        )
    rows.append(
        {
            "bar": len(details) + 1,
            "label": "match_weight",
            "comparison": "match_weight",
            "gamma": -1,
            "condition": None,
            "bayes_factor": 2.0 ** mw,
            "tf_adjustment": 1.0,
            "log2_bayes_factor": 0.0,
            "cumulative_weight": mw,
        }
    )
    return pa.Table.from_pylist(rows, schema=WATERFALL_SCHEMA)


def _fetch_row(ds, unique_id: str) -> Optional[dict]:
    """Collect the (single) row with this unique_id from a cleaned Dataset.

    The predicate is a pyarrow compute mask, not an interpolated filter
    expression — ids are external data (see ADVICE round 2 on expression
    injection in evaluate.py)."""
    import pyarrow.compute as pc

    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("unique_id"), unique_id))

    got = ds.map_batches(flt, batch_format="pyarrow").take(1)
    return got[0] if got else None


def pair_waterfall(
    cleaned_l,
    cleaned_r,
    unique_id_l: str,
    unique_id_r: str,
    model: Optional[MatchModel] = None,
    numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
) -> Tuple[pa.Table, str]:
    """Waterfall for one (canonical id, messy id) pair fetched from cleaned
    Datasets — the engine's equivalent of the reference's per-pair waterfall
    drill-down. Returns (decomposition table, SVG string)."""
    l_row = _fetch_row(cleaned_l, unique_id_l)
    r_row = _fetch_row(cleaned_r, unique_id_r)
    if l_row is None or r_row is None:
        missing = unique_id_l if l_row is None else unique_id_r
        raise KeyError(f"unique_id not found in cleaned dataset: {missing!r}")
    tbl = waterfall_rows(l_row, r_row, model, numeric_tf)
    title = (
        f"{r_row.get('original_address_concat') or ''} {r_row.get('postcode') or ''}"
        f"  vs  "
        f"{l_row.get('original_address_concat') or ''} {l_row.get('postcode') or ''}"
    )
    return tbl, waterfall_svg(tbl, title=title.strip())


# ---------------------------------------------------------------- SVG layer

_W, _BAR_H, _GAP, _LEFT, _RIGHT, _TOP = 760, 22, 6, 190, 70, 34
_POS_FILL, _NEG_FILL, _END_FILL = "#2e7d32", "#c62828", "#1565c0"


def _esc(s: object) -> str:
    return _sx.escape(str(s))


def waterfall_svg(tbl: pa.Table, title: str = "") -> str:
    """Render a waterfall_rows table as a horizontal floating-bar SVG.

    Deterministic (fixed layout, 2-decimal coordinates); first and last bars
    are anchored at 0 (prior / final weight), interior bars float from the
    previous cumulative weight."""
    labels = tbl.column("label").to_pylist()
    cums = tbl.column("cumulative_weight").to_pylist()
    contribs = tbl.column("log2_bayes_factor").to_pylist()
    gammas = tbl.column("gamma").to_pylist()
    n = len(labels)
    height = _TOP + n * (_BAR_H + _GAP) + 30

    lo = min(0.0, *cums)
    hi = max(0.0, *cums)
    if hi == lo:
        hi = lo + 1.0
    span = hi - lo
    plot_w = _W - _LEFT - _RIGHT

    def x_of(v: float) -> float:
        return _LEFT + (v - lo) / span * plot_w

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="{_LEFT}" y="16" font-size="13">{_esc(title)}</text>'
        if title
        else "",
        # zero axis
        f'<line x1="{x_of(0):.2f}" y1="{_TOP - 6}" x2="{x_of(0):.2f}" '
        f'y2="{height - 24}" stroke="#888" stroke-dasharray="3,3"/>',
    ]
    prev = 0.0
    for i, (label, cum, contrib, gamma) in enumerate(
        zip(labels, cums, contribs, gammas)
    ):
        y = _TOP + i * (_BAR_H + _GAP)
        if label in ("prior", "match_weight"):
            a, b = 0.0, cum
            fill = _END_FILL
        else:
            a, b = prev, cum
            fill = _POS_FILL if contrib >= 0 else _NEG_FILL
        x0, x1 = sorted((x_of(a), x_of(b)))
        w = max(x1 - x0, 0.75)
        parts.append(
            f'<rect x="{x0:.2f}" y="{y}" width="{w:.2f}" height="{_BAR_H}" '
            f'fill="{fill}" fill-opacity="0.85"/>'
        )
        gtxt = "" if label in ("prior", "match_weight") else f" (γ={gamma})"
        parts.append(
            f'<text x="4" y="{y + _BAR_H - 6}">{_esc(label)}{_esc(gtxt)}</text>'
        )
        parts.append(
            f'<text x="{x1 + 4:.2f}" y="{y + _BAR_H - 6}" fill="#444">'
            f"{contrib if label not in ('prior', 'match_weight') else cum:+.3f}</text>"
        )
        prev = cum
    parts.append(
        f'<text x="{_LEFT}" y="{height - 8}" fill="#444">'
        f"match_weight = {cums[-1]:.6f}</text>"
    )
    parts.append("</svg>")
    return "".join(p for p in parts if p)


def history_rows(history: Sequence[dict]) -> pa.Table:
    """Tuning history (pipelines/tune.py output) -> long-format table
    (iteration, variable, value) — the reference chart's data frame shape
    (improve_parameters_using_gradient_descent.py:486, melt to long)."""
    out_it: List[int] = []
    out_var: List[str] = []
    out_val: List[float] = []
    for rec in history:
        it = int(rec.get("iteration", 0))
        for k, v in rec.items():
            if k == "iteration" or v is None:
                continue
            out_it.append(it)
            out_var.append(k)
            out_val.append(float(v))
    return pa.table(
        {
            "iteration": pa.array(out_it, pa.int32()),
            "variable": pa.array(out_var, pa.string()),
            "value": pa.array(out_val, pa.float64()),
        }
    )


def history_svg(history: Sequence[dict], variables: Optional[Sequence[str]] = None) -> str:
    """Small-multiple line charts (one panel per variable) over a tuning
    history — the engine's rendering of the reference's iteration chart."""
    tbl = history_rows(history)
    its = tbl.column("iteration").to_pylist()
    vars_ = tbl.column("variable").to_pylist()
    vals = tbl.column("value").to_pylist()
    series: Dict[str, List[Tuple[int, float]]] = {}
    for it, var, val in zip(its, vars_, vals):
        series.setdefault(var, []).append((it, val))
    names = list(variables) if variables is not None else sorted(series)
    names = [nm for nm in names if nm in series]

    panel_w, panel_h, pad, left = 680, 90, 14, 70
    height = pad + len(names) * (panel_h + pad)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{panel_w + left + 90}" '
        f'height="{height}" font-family="monospace" font-size="11">'
    ]
    for pi, name in enumerate(names):
        pts = sorted(series[name])
        y0 = pad + pi * (panel_h + pad)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        x_lo, x_hi = min(xs), max(xs)
        y_lo, y_hi = min(ys), max(ys)
        if x_hi == x_lo:
            x_hi = x_lo + 1
        if y_hi == y_lo:
            y_hi = y_lo + 1.0
        coords = [
            (
                left + (x - x_lo) / (x_hi - x_lo) * panel_w,
                y0 + panel_h - (y - y_lo) / (y_hi - y_lo) * (panel_h - 16) - 8,
            )
            for x, y in zip(xs, ys)
        ]
        poly = " ".join(f"{x:.2f},{y:.2f}" for x, y in coords)
        parts.append(
            f'<rect x="{left}" y="{y0}" width="{panel_w}" height="{panel_h}" '
            f'fill="none" stroke="#ccc"/>'
        )
        parts.append(f'<text x="4" y="{y0 + 12}">{_esc(name)}</text>')
        parts.append(
            f'<polyline points="{poly}" fill="none" stroke="{_END_FILL}" '
            f'stroke-width="1.5"/>'
        )
        for (cx, cy), v in zip(coords, ys):
            parts.append(f'<circle cx="{cx:.2f}" cy="{cy:.2f}" r="2.5" fill="{_END_FILL}"/>')
        parts.append(
            f'<text x="{left + panel_w + 6}" y="{y0 + 12}" fill="#444">{ys[-1]:.4f}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)
