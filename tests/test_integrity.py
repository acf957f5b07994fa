"""FK coverage: orphan accounting, null keys, empties, oracle parity;
latest_events: argmax ties, partial-pruning invariance."""

import datetime as dt

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.integrity import (
    fk_coverage,
    fk_coverage_sql,
)
from uk_address_matcher_ray.stages.sessions import (
    latest_events,
    latest_events_sql,
)


def _fk(child_keys, parent_keys):
    import ray

    c = pa.table({"ck": pa.array(child_keys, pa.int64())})
    p = pa.table({"pk": pa.array(parent_keys, pa.int64())})
    out = fk_coverage(
        ray.data.from_arrow(c), ray.data.from_arrow(p), "ck", "pk"
    ).take_all()[0]
    con = duckdb.connect()
    con.register("c", c)
    con.register("p", p)
    exp = con.sql(fk_coverage_sql("c", "p", "ck", "pk")).arrow().to_pylist()[0]
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_fk_orphans_and_nulls():
    out = _fk([1, 1, 2, 3, 3, 3, None], [1, 2, 9, None])
    assert out == {
        "n_child_rows": 6,
        "n_child_keys": 3,
        "n_matched_keys": 2,
        "n_orphan_keys": 1,   # key 3
        "n_orphan_rows": 3,
    }


@pytest.mark.usefixtures("ray_session")
def test_fk_clean_and_empty():
    out = _fk([5, 5, 6], [5, 6, 7])
    assert out["n_orphan_keys"] == 0 and out["n_matched_keys"] == 2
    out = _fk([], [1, 2])
    assert all(v == 0 for v in out.values())


T0 = dt.datetime(2026, 1, 1)


@pytest.mark.usefixtures("ray_session")
def test_latest_events_argmax_and_ties():
    import ray

    rows = [
        (1, "view", 0), (1, "purchase", 5), (1, "click", 3),
        (2, "view", 7), (2, "click", 7),   # ts tie -> higher event_id
        (3, "error", 1),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(
                [T0 + dt.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    for ds in (
        ray.data.from_arrow(t),
        ray.data.from_arrow(t).repartition(4),
    ):
        out = {
            r["user_id"]: (r["event_type"], r["event_id"])
            for r in latest_events(ds).take_all()
        }
        assert out == {
            1: ("purchase", 1),
            2: ("click", 4),   # tie at ts=7 -> event_id 4 beats 3
            3: ("error", 5),
        }
    con = duckdb.connect()
    con.register("events", t)
    exp = {
        r["user_id"]: (r["event_type"], r["event_id"])
        for r in con.sql(latest_events_sql()).arrow().to_pylist()
    }
    con.close()
    assert out == exp
