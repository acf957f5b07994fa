"""asof_join (stages/joins.py) vs a brute-force per-row reference:
random keys/timestamps INCLUDING exact ties (left ts == right ts must
match), keys with no right rows (inner drop), empty sides, and string
keys. The driver query's DuckDB ASOF JOIN parity runs in
tests/test_entry_queries.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.joins import asof_join


def _brute(left_rows, right_rows):
    out = []
    for l in left_rows:
        cands = [
            r
            for r in right_rows
            if r["k"] == l["k"] and r["ts"] <= l["ts"]
        ]
        if not cands:
            continue
        best_ts = max(r["ts"] for r in cands)
        out.append((l["id"], l["k"], l["ts"], best_ts))
    return sorted(out)


def _ds(rows, schema):
    import ray

    from uk_address_matcher_ray.util import dataset_from_table

    return dataset_from_table(
        pa.Table.from_pylist(rows, schema=schema), target_blocks=3
    )


_LEFT_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("k", pa.int64()),
        pa.field("ts", pa.int64()),
    ]
)
_RIGHT_SCHEMA = pa.schema(
    [pa.field("k", pa.int64()), pa.field("ts", pa.int64())]
)


@pytest.mark.usefixtures("ray_session")
@given(data=st.data())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_matches_brute_force(data):
    n_keys = data.draw(st.integers(1, 4))
    ts_pool = st.integers(0, 20)  # narrow range -> frequent exact ties
    left_rows = [
        {
            "id": i,
            "k": data.draw(st.integers(0, n_keys)),
            "ts": data.draw(ts_pool),
        }
        for i in range(data.draw(st.integers(1, 15)))
    ]
    right_rows = [
        {"k": data.draw(st.integers(0, n_keys)), "ts": data.draw(ts_pool)}
        for _ in range(data.draw(st.integers(0, 15)))
    ]
    out = asof_join(
        _ds(left_rows, _LEFT_SCHEMA),
        _ds(right_rows, _RIGHT_SCHEMA),
        key="k",
        ts="ts",
        right_cols=["ts"],
    ).take_all()
    got = sorted((r["id"], r["k"], r["ts"], r["ts_r"]) for r in out)
    assert got == _brute(left_rows, right_rows)


@pytest.mark.usefixtures("ray_session")
def test_asof_string_keys_and_extra_cols():
    left = [
        {"id": 1, "k": "a", "ts": 10, "note": "x"},
        {"id": 2, "k": "b", "ts": 5, "note": "y"},
        {"id": 3, "k": "c", "ts": 7, "note": "z"},  # no right rows -> drop
    ]
    right = [
        {"k": "a", "ts": 10, "v": 1.5},
        {"k": "a", "ts": 3, "v": 2.5},
        {"k": "b", "ts": 6, "v": 9.9},  # after left ts -> no match
    ]
    ls = pa.schema(
        [
            pa.field("id", pa.int64()),
            pa.field("k", pa.string()),
            pa.field("ts", pa.int64()),
            pa.field("note", pa.string()),
        ]
    )
    rs = pa.schema(
        [
            pa.field("k", pa.string()),
            pa.field("ts", pa.int64()),
            pa.field("v", pa.float64()),
        ]
    )
    out = asof_join(
        _ds(left, ls), _ds(right, rs), key="k", ts="ts", right_cols=["ts", "v"]
    ).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["id"], r["ts_r"], r["v_r"], r["note"]) == (1, 10, 1.5, "x")


def _brute_range(left_rows, right_rows, w):
    out = []
    for i, l in enumerate(left_rows):
        for j, r in enumerate(right_rows):
            if r["k"] == l["k"] and abs(r["ts"] - l["ts"]) <= w:
                out.append((l["id"], l["k"], l["ts"], r["ts"], r["rid"]))
    return sorted(out)


_RIGHT_ID_SCHEMA = pa.schema(
    [
        pa.field("k", pa.int64()),
        pa.field("ts", pa.int64()),
        pa.field("rid", pa.int64()),
    ]
)


@pytest.mark.usefixtures("ray_session")
@given(data=st.data())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_range_join_matches_brute_force(data):
    from uk_address_matcher_ray.stages.joins import range_join

    w = data.draw(st.integers(1, 5))
    n_keys = data.draw(st.integers(1, 3))
    ts_pool = st.integers(0, 25)
    left_rows = [
        {"id": i, "k": data.draw(st.integers(0, n_keys)), "ts": data.draw(ts_pool)}
        for i in range(data.draw(st.integers(1, 12)))
    ]
    right_rows = [
        {"k": data.draw(st.integers(0, n_keys)), "ts": data.draw(ts_pool), "rid": 100 + j}
        for j in range(data.draw(st.integers(0, 12)))
    ]
    out = range_join(
        _ds(left_rows, _LEFT_SCHEMA),
        _ds(right_rows, _RIGHT_ID_SCHEMA),
        key="k",
        ts="ts",
        window=w,
        right_cols=["ts", "rid"],
    ).take_all()
    got = sorted((r["id"], r["k"], r["ts"], r["ts_r"], r["rid_r"]) for r in out)
    assert got == _brute_range(left_rows, right_rows, w)
