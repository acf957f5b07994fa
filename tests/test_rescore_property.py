"""Hypothesis gate: ImproveStage's vectorized table path (process_table,
flat builders + memo + slimmed cet) must equal the legacy per-row dict path
(process_rows) on generated pair groups."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.rescore import ImproveStage

_TOK = st.sampled_from(
    ["FLAT", "1", "2", "12", "HIGH", "STREET", "PEPPER", "ROAD", "LONDON", "A", "B"]
)
_ADDR = st.one_of(
    st.lists(_TOK, min_size=1, max_size=7).map(" ".join),
    # whitespace / empty edge artifacts: _tokens() emits "" edge tokens for
    # non-space whitespace, and None/"" addresses take different join paths
    st.sampled_from(
        [None, "", "  ", "\tHIGH STREET", "HIGH STREET\t", "\t", "café straße 1"]
    ),
)
_PC = st.sampled_from(["ZZ1 9ZZ", "AB1 2CD", None])
_HIST_TOK = st.sampled_from(["LONDON", "ROAD", "STREET"])


@st.composite
def _group(draw, gid):
    n = draw(st.integers(1, 6))
    cet = draw(st.lists(_HIST_TOK, min_size=0, max_size=3, unique=True))
    hist = [{"tok": t, "rel_freq": 0.25, "count": 1} for t in sorted(cet)]
    rows = []
    for i in range(n):
        rows.append(
            {
                "unique_id_r": f"m{gid:03d}",
                "unique_id_l": f"c{gid:03d}_{i}",
                "match_weight": draw(
                    st.floats(-30.0, 30.0, allow_nan=False, width=32)
                ),
                "match_key": draw(st.integers(0, 17)),
                "original_address_concat_l": draw(_ADDR),
                "original_address_concat_r": draw(_ADDR),
                "postcode_l": draw(_PC),
                "postcode_r": draw(_PC),
                "common_end_tokens_hist_r": hist if hist else None,
            }
        )
    return rows


@given(data=st.data(), n_groups=st.integers(1, 5))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_process_table_equals_process_rows(data, n_groups):
    stage = ImproveStage(
        dedup_first=True,
        match_weight_threshold=-20.0,
        top_n_matches=3,
        use_bigrams=True,
    )
    groups = [data.draw(_group(g)) for g in range(n_groups)]
    all_rows = [r for g in groups for r in g]
    tbl = pa.Table.from_pylist(
        sorted(all_rows, key=lambda r: r["unique_id_r"])
    )
    via_table = stage.process_table(tbl).to_pylist()

    via_pydict = stage.process_table_pydict(tbl).to_pylist()

    via_rows = []
    for g in groups:
        via_rows.extend(stage.process_rows(list(g)))

    def canon(recs):
        return sorted(
            (repr(sorted(r.items(), key=lambda kv: kv[0])) for r in recs)
        )

    assert canon(via_table) == canon(via_rows)
    assert canon(via_pydict) == canon(via_rows)


@given(data=st.data(), n_groups=st.integers(1, 4))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_passthrough_columns_parity(data, n_groups):
    """passthrough columns (gather-path payload indices) must ride from the
    selected input row to the output identically in both table paths."""
    import pyarrow as pa_

    stage = ImproveStage(
        dedup_first=True,
        passthrough=(("__src_idx_l", pa_.int64()), ("__src_idx_r", pa_.int64())),
        match_weight_threshold=-20.0,
        top_n_matches=3,
    )
    groups = [data.draw(_group(g)) for g in range(n_groups)]
    all_rows = [r for g in groups for r in g]
    for j, r in enumerate(all_rows):
        r["__src_idx_l"] = 1000 + j
        r["__src_idx_r"] = 2000 + j
    tbl = pa_.Table.from_pylist(
        sorted(all_rows, key=lambda r: r["unique_id_r"])
    )
    via_table = stage.process_table(tbl).to_pylist()
    via_pydict = stage.process_table_pydict(tbl).to_pylist()

    def canon(recs):
        return sorted(
            (repr(sorted(r.items(), key=lambda kv: kv[0])) for r in recs)
        )

    assert canon(via_table) == canon(via_pydict)
    for r in via_table:
        assert r["__src_idx_l"] >= 1000 and r["__src_idx_r"] >= 2000

    # the per-group __call__ path (process_rows) must fill passthrough too —
    # regression: it used to drop them and from_pylist null-filled silently
    via_call = []
    for g in groups:
        if g:
            via_call.extend(stage(pa_.Table.from_pylist(g)).to_pylist())
    assert canon(via_call) == canon(via_table)
