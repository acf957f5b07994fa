"""TPC-H-Q4-shape existence semi-join: strict inequality, missing
sides, oracle parity, partition invariance."""

import datetime as dt

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.olap import (
    late_ship_priority_counts,
    late_ship_priority_counts_sql,
)

D = lambda d: dt.datetime(1997, 1, d)


def _run(orders, lineitem, parts=1):
    import ray

    o = ray.data.from_arrow(orders)
    li = ray.data.from_arrow(lineitem)
    if parts > 1:
        o, li = o.repartition(parts), li.repartition(parts)
    out = sorted(
        map(repr, late_ship_priority_counts(o, li).take_all())
    )
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("lineitem", lineitem)
    exp = sorted(
        map(
            repr,
            con.sql(late_ship_priority_counts_sql()).arrow().to_pylist(),
        )
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_q4_semantics():
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT", "3-LOW"],
            "o_orderdate": pa.array([D(10)] * 4, pa.timestamp("us")),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 5], pa.int64()),
            "l_shipdate": pa.array(
                [D(5), D(20), D(9), D(10), D(25)], pa.timestamp("us")
            ),
        }
    )
    # order 1 late (20 > 10); order 2 early; order 3 equal (strict >);
    # order 4 has no lines; line 5 has no order
    out = _run(orders, lineitem)
    assert out == ["{'o_orderpriority': '1-URGENT', 'n_orders': 1}"]
    assert _run(orders, lineitem, parts=5) == out


@pytest.mark.usefixtures("ray_session")
def test_q4_empty_sides():
    empty_o = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderpriority": pa.array([], pa.string()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([1], pa.int64()),
            "l_shipdate": pa.array([D(1)], pa.timestamp("us")),
        }
    )
    assert _run(empty_o, li) == []
