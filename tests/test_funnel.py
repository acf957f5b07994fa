"""Funnel conversions: greedy-vs-min-chain parity, ties, ordering,
repeated steps, empty input."""

import datetime as dt

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.funnel import (
    funnel_conversions,
    funnel_sql,
)

T0 = dt.datetime(2026, 1, 1)


def _events(rows):
    return pa.table(
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


def _run(rows, steps):
    import ray

    t = _events(rows)
    out = sorted(
        funnel_conversions(ray.data.from_arrow(t), steps).take_all(),
        key=lambda r: r["step"],
    )
    con = duckdb.connect()
    con.register("events", t)
    exp = sorted(
        con.sql(funnel_sql(steps)).arrow().to_pylist(),
        key=lambda r: r["step"],
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_funnel_order_and_ties():
    rows = [
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),  # full
        (2, "click", 0), (2, "view", 1), (2, "click", 2),     # v->c only
        (3, "view", 5),                                        # v only
        (4, "view", 7), (4, "click", 7), (4, "purchase", 7),  # tie: ids
        (5, "error", 1),                                       # none
    ]
    out = _run(rows, ["view", "click", "purchase"])
    assert [r["users"] for r in out] == [4, 3, 2]


@pytest.mark.usefixtures("ray_session")
def test_funnel_repeated_step_needs_two_events():
    rows = [
        (1, "view", 0),                    # one view: reaches step 1 only
        (2, "view", 0), (2, "view", 1),    # two views: reaches step 2
        (3, "view", 3), (3, "view", 3),    # same ts, distinct ids: step 2
    ]
    out = _run(rows, ["view", "view"])
    assert [r["users"] for r in out] == [3, 2]


@pytest.mark.usefixtures("ray_session")
def test_funnel_out_of_order_events_do_not_count():
    rows = [(1, "purchase", 0), (1, "click", 1), (1, "view", 2)]
    out = _run(rows, ["view", "click", "purchase"])
    assert [r["users"] for r in out] == [1, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_funnel_empty_events():
    out = _run([], ["view", "click"])
    assert [r["users"] for r in out] == [0, 0]
