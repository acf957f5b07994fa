"""Hot-key-safe chunked sessionize: the complete-group contract removed.

Three gates:
* pure-merge unit: one key's timeline split into tiny chunks (chunk size
  << session count and << row count) through ``_sessions_local`` +
  ``_session_merge_plan`` equals the monolithic kernel — the bounded-
  memory evidence (no structure ever holds more than one chunk of the
  key plus O(chunks) metadata);
* randomized differential: multi-key random timelines at several chunk
  sizes vs the monolithic kernel;
* end-to-end: ``sessionize_chunked`` over a Ray Dataset equals
  ``sessionize`` (grouped complete-group path) row-for-row.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.sessions import (
    _session_merge_plan,
    _sessions_local,
    sessionize,
    sessionize_chunked,
)

GAP = 30


def _schema(with_value: bool) -> pa.Schema:
    fields = [
        pa.field("user_id", pa.int64()),
        pa.field("session_id", pa.int64()),
        pa.field("session_start", pa.int64()),
        pa.field("session_end", pa.int64()),
        pa.field("n_events", pa.int64()),
    ]
    if with_value:
        fields.append(pa.field("sum_value_cents", pa.int64()))
    return pa.schema(fields)


def _tbl(keys, tss, vals=None):
    cols = {
        "user_id": pa.array(keys, pa.int64()),
        "ts": pa.array(tss, pa.int64()),
    }
    if vals is not None:
        cols["value"] = pa.array(vals, pa.float64())
    return pa.table(cols)


def _chunked_rows(tbl: pa.Table, chunk: int, with_value: bool):
    """Run the chunked machinery by hand over ``chunk``-row slices of the
    (key, ts)-sorted table — exactly what the task wave does, minus Ray."""
    schema = _schema(with_value)
    value = "value" if with_value else None
    order = pa.compute.sort_indices(
        tbl, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
    )
    s = tbl.take(order)
    locals_, metas = [], []
    for off in range(0, s.num_rows, chunk):
        t = s.slice(off, chunk)
        local = _sessions_local(t, "user_id", "ts", GAP, value, None, schema)
        meta = {
            "first_key": local.column("user_id")[0].as_py(),
            "last_key": local.column("user_id")[-1].as_py(),
            "first_row_ts": t.column("ts")[0].as_py(),
            "last_row_ts": t.column("ts")[-1].as_py(),
            "n_sessions": local.num_rows,
            "first_sess": _sess(local, 0, with_value),
            "last_sess": _sess(local, -1, with_value),
        }
        locals_.append(local)
        metas.append(meta)
    plans, flushed = _session_merge_plan(metas, GAP, with_value)
    rows = []
    for local, plan in zip(locals_, plans):
        off_, drop_first, drop_last = plan
        lo = 1 if drop_first else 0
        hi = local.num_rows - (1 if drop_last else 0)
        fk = local.column("user_id")[0].as_py()
        for r in local.slice(lo, max(0, hi - lo)).to_pylist():
            if off_ and r["user_id"] == fk:
                r["session_id"] += off_
            rows.append(r)
    for f in flushed:
        r = {
            "user_id": f["key"],
            "session_id": f["id"],
            "session_start": f["start"],
            "session_end": f["end"],
            "n_events": f["n"],
        }
        if with_value:
            r["sum_value_cents"] = f["cents"]
        rows.append(r)
    return sorted(rows, key=lambda r: (r["user_id"], r["session_id"]))


def _sess(local, i, with_value):
    d = {
        "key": local.column("user_id")[i].as_py(),
        "id": local.column("session_id")[i].as_py(),
        "start": local.column("session_start")[i].as_py(),
        "end": local.column("session_end")[i].as_py(),
        "n": local.column("n_events")[i].as_py(),
    }
    if with_value:
        d["cents"] = local.column("sum_value_cents")[i].as_py()
    return d


def _mono_rows(tbl, with_value):
    schema = _schema(with_value)
    value = "value" if with_value else None
    out = _sessions_local(tbl, "user_id", "ts", GAP, value, None, schema)
    return sorted(
        out.to_pylist(), key=lambda r: (r["user_id"], r["session_id"])
    )


def test_single_giant_key_tiny_chunks():
    """One key, 5000 rows, chunk=7 — sessions routinely span MANY chunks;
    carry state is one session dict. Equals the monolithic kernel."""
    rng = random.Random(3)
    tss = np.cumsum([rng.choice([1, 2, GAP + 1]) for _ in range(5000)])
    vals = [rng.randint(0, 500) / 100 for _ in range(5000)]
    tbl = _tbl([7] * 5000, tss.tolist(), vals)
    assert _chunked_rows(tbl, 7, True) == _mono_rows(tbl, True)
    # one mega-session (no gap ever exceeded) across every chunk
    tbl2 = _tbl([7] * 1000, list(range(0, 2000, 2)), None)
    rows = _chunked_rows(tbl2, 13, False)
    assert rows == _mono_rows(tbl2, False)
    assert len(rows) == 1 and rows[0]["n_events"] == 1000


def test_randomized_differential_chunk_sizes():
    rng = random.Random(11)
    for trial in range(8):
        n = rng.randint(1, 400)
        keys = [rng.randint(1, 5) for _ in range(n)]
        tss = [rng.randint(0, 600) for _ in range(n)]
        vals = [rng.randint(0, 300) / 100 for _ in range(n)]
        tbl = _tbl(keys, tss, vals)
        mono = _mono_rows(tbl, True)
        for chunk in (1, 3, 17, n or 1):
            assert _chunked_rows(tbl, chunk, True) == mono, (trial, chunk)


@pytest.mark.usefixtures("ray_session")
def test_end_to_end_matches_grouped_path():
    import ray

    from uk_address_matcher_ray.util import dataset_from_table

    rng = random.Random(5)
    n = 4000
    keys = [rng.randint(1, 40) for _ in range(n)]
    base = pa.table(
        {
            "user_id": pa.array(keys, pa.int64()),
            "ts": pa.array(
                [rng.randint(0, 10_000) for _ in range(n)], pa.int64()
            ),
            "event_id": pa.array(list(range(n)), pa.int64()),
            "value": pa.array(
                [rng.randint(0, 900) / 100 for _ in range(n)], pa.float64()
            ),
        }
    )
    ds = dataset_from_table(base, target_blocks=16)
    a = sorted(
        map(
            repr,
            sessionize(
                ds, key="user_id", ts="ts", gap=GAP, value="value",
                tiebreak="event_id",
            ).take_all(),
        )
    )
    b = sorted(
        map(
            repr,
            sessionize_chunked(
                ds, key="user_id", ts="ts", gap=GAP, value="value",
                tiebreak="event_id",
            ).take_all(),
        )
    )
    assert a == b
