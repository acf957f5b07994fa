"""Ordered timeline assembly: order, ties, oracle parity, partition
invariance."""

import datetime as dt

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.sessions import (
    user_timelines,
    user_timelines_sql,
)

T0 = dt.datetime(2026, 1, 1)


def _run(rows, parts=1):
    import ray

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
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = sorted(map(repr, user_timelines(ds).take_all()))
    con = duckdb.connect()
    con.register("events", t)
    exp = sorted(
        map(repr, con.sql(user_timelines_sql()).arrow().to_pylist())
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_timeline_order_and_ties():
    rows = [
        (1, "view", 5), (1, "click", 1), (1, "purchase", 9),
        (2, "a", 3), (2, "b", 3),   # same ts: event_id order (3 then 4)
        (3, "solo", 0),
    ]
    out = _run(rows)
    vals = {eval(r)["user_id"]: eval(r)["timeline"] for r in out}
    assert vals[1] == "click>view>purchase"
    assert vals[2] == "a>b"
    assert vals[3] == "solo"
    assert _run(rows, parts=4) == out


@pytest.mark.usefixtures("ray_session")
def test_timeline_empty():
    assert _run([]) == []
