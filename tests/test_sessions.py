"""sessionize (stages/sessions.py) vs a brute-force per-key reference:
random keys/timestamps with frequent exact ties (tiebreak column decides),
strict-gap boundary semantics (delta == gap stays in session, delta ==
gap+1 splits), and integer-cents sums."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uk_address_matcher_ray.stages.sessions import sessionize


def _brute(rows, gap):
    out = []
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        rs = sorted(rs, key=lambda r: (r["ts"], r["eid"]))
        sid = 0
        prev = None
        sess = None
        for r in rs:
            if prev is None or r["ts"] - prev > gap:
                if sess:
                    out.append(tuple(sess))
                sid += 1
                sess = [k, sid, r["ts"], r["ts"], 0, 0]
            sess[3] = r["ts"]
            sess[4] += 1
            sess[5] += int(np.rint(r["v"] * 100.0))
            prev = r["ts"]
        if sess:
            out.append(tuple(sess))
    return sorted(out)


_SCHEMA = pa.schema(
    [
        pa.field("eid", pa.int64()),
        pa.field("k", pa.int64()),
        pa.field("ts", pa.int64()),
        pa.field("v", pa.float64()),
    ]
)


@pytest.mark.usefixtures("ray_session")
@given(data=st.data())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_sessionize_matches_brute_force(data):
    from uk_address_matcher_ray.util import dataset_from_table

    gap = data.draw(st.integers(1, 4))
    rows = [
        {
            "eid": i,
            "k": data.draw(st.integers(0, 3)),
            "ts": data.draw(st.integers(0, 30)),
            "v": data.draw(st.integers(0, 999)) / 100.0,
        }
        for i in range(data.draw(st.integers(1, 20)))
    ]
    ds = dataset_from_table(
        pa.Table.from_pylist(rows, schema=_SCHEMA), target_blocks=3
    )
    out = sessionize(
        ds, key="k", ts="ts", gap=gap, value="v", tiebreak="eid"
    ).take_all()
    got = sorted(
        (
            r["k"],
            r["session_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value_cents"],
        )
        for r in out
    )
    assert got == _brute(rows, gap)


@pytest.mark.usefixtures("ray_session")
def test_gap_boundary_strictness():
    from uk_address_matcher_ray.util import dataset_from_table

    rows = [
        {"eid": 1, "k": 1, "ts": 0, "v": 1.0},
        {"eid": 2, "k": 1, "ts": 10, "v": 2.0},  # delta == gap: same session
        {"eid": 3, "k": 1, "ts": 21, "v": 4.0},  # delta == gap+1: new session
    ]
    ds = dataset_from_table(pa.Table.from_pylist(rows, schema=_SCHEMA))
    out = sorted(
        sessionize(ds, key="k", ts="ts", gap=10, value="v").take_all(),
        key=lambda r: r["session_id"],
    )
    assert [(r["session_id"], r["n_events"], r["sum_value_cents"]) for r in out] == [
        (1, 2, 300),
        (2, 1, 400),
    ]
