"""Waterfall / history chart rendering (pipelines/report.py).

The DATA contract is exact: the waterfall decomposition must reproduce
``score_pair``'s match weight bit-for-bit (same compiled levels, same
float-addition order). The SVG layer is checked for well-formedness and
bar/panel counts (no chart libraries in the container to compare against).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa
import pytest

from uk_address_matcher_ray.functions.compare import prepare_row, score_pair
from uk_address_matcher_ray.pipelines.report import (
    history_rows,
    history_svg,
    pair_waterfall,
    waterfall_rows,
    waterfall_svg,
)
from uk_address_matcher_ray.sources import synth
from uk_address_matcher_ray.stages import tf as tf_mod
from uk_address_matcher_ray.stages.clean import clean_batch
from uk_address_matcher_ray.state.model import MatchModel


def _cleaned_sides():
    keys = list(range(1, 40))
    canon, messy = synth.canonical_table(keys), synth.messy_table(keys)
    union = pa.concat_tables([canon, messy])
    addrs = union.column("address_concat").to_pylist()
    tok_counts, _n, end_counts, _nt = tf_mod.corpus_token_stats(addrs)
    cleaned = clean_batch(
        union, tf_mod.rel_freq_table(tok_counts), tf_mod.end_token_set(end_counts)
    )
    n_c = canon.num_rows
    return cleaned.slice(0, n_c), cleaned.slice(n_c)


def test_waterfall_rows_bit_exact_vs_score_pair():
    cleaned_l, cleaned_r = _cleaned_sides()
    model = MatchModel()
    l_row, r_row = cleaned_l.to_pylist()[0], cleaned_r.to_pylist()[0]
    tbl = waterfall_rows(l_row, r_row, model, {})
    mw, _prob, _g = score_pair(prepare_row(l_row), prepare_row(r_row), model, {})

    cums = tbl.column("cumulative_weight").to_pylist()
    contribs = tbl.column("log2_bayes_factor").to_pylist()
    labels = tbl.column("label").to_pylist()
    assert labels[0] == "prior" and labels[-1] == "match_weight"
    assert len(labels) == len(model.comparisons) + 2
    assert cums[-1] == mw  # bit-exact, not approx
    # cumulative is the running sum of contributions in model order
    run = contribs[0]
    for c, cum in zip(contribs[1:-1], cums[1:-1]):
        run += c
        assert run == cum


def test_waterfall_svg_well_formed():
    cleaned_l, cleaned_r = _cleaned_sides()
    l_row, r_row = cleaned_l.to_pylist()[2], cleaned_r.to_pylist()[2]
    tbl = waterfall_rows(l_row, r_row)
    svg = waterfall_svg(tbl, title="messy <addr> & canon")
    root = ET.fromstring(svg)  # well-formed XML (incl. escaped title)
    rects = [e for e in root.iter() if e.tag.endswith("rect")]
    assert len(rects) == tbl.num_rows  # one bar per decomposition row
    assert svg == waterfall_svg(tbl, title="messy <addr> & canon")  # deterministic


@pytest.mark.usefixtures("ray_session")
def test_pair_waterfall_fetches_rows():
    import ray

    cleaned_l, cleaned_r = _cleaned_sides()
    uid_l = cleaned_l.column("unique_id")[0].as_py()
    uid_r = cleaned_r.column("unique_id")[0].as_py()
    tbl, svg = pair_waterfall(
        ray.data.from_arrow(cleaned_l),
        ray.data.from_arrow(cleaned_r),
        uid_l,
        uid_r,
    )
    l_row = cleaned_l.to_pylist()[0]
    r_row = cleaned_r.to_pylist()[0]
    expect = waterfall_rows(l_row, r_row)
    assert tbl.column("cumulative_weight").to_pylist() == expect.column(
        "cumulative_weight"
    ).to_pylist()
    ET.fromstring(svg)
    with pytest.raises(KeyError):
        pair_waterfall(
            ray.data.from_arrow(cleaned_l),
            ray.data.from_arrow(cleaned_r),
            'no"such',
            uid_r,
        )


def test_history_chart():
    history = [
        {"iteration": -1, "score": 10.0, "REWARD": 2.0},
        {"iteration": 0, "score": 12.5, "REWARD": 2.2},
        {"iteration": 1, "score": 13.0, "REWARD": 2.1},
    ]
    tbl = history_rows(history)
    assert tbl.num_rows == 6
    assert set(tbl.column("variable").to_pylist()) == {"score", "REWARD"}
    svg = history_svg(history)
    root = ET.fromstring(svg)
    polys = [e for e in root.iter() if e.tag.endswith("polyline")]
    assert len(polys) == 2
    # panel order respects an explicit variable list
    svg_one = history_svg(history, variables=["score"])
    polys_one = [
        e for e in ET.fromstring(svg_one).iter() if e.tag.endswith("polyline")
    ]
    assert len(polys_one) == 1
