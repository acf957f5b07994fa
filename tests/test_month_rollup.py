"""Calendar-month rollup: boundary dates, leap month, cents exactness,
oracle parity, partition invariance."""

import datetime as dt

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.olap import (
    orders_by_month,
    orders_by_month_sql,
)


def _run(rows, parts=1):
    import ray

    t = pa.table(
        {
            "o_orderdate": pa.array(
                [r[0] for r in rows], pa.timestamp("us")
            ),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = sorted(map(repr, orders_by_month(ds).take_all()))
    con = duckdb.connect()
    con.register("orders", t)
    exp = sorted(
        map(repr, con.sql(orders_by_month_sql()).arrow().to_pylist())
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_month_boundaries_and_leap():
    rows = [
        (dt.datetime(1997, 1, 1, 0, 0, 0), 10.25),
        (dt.datetime(1997, 1, 31, 23, 59, 59), 5.75),
        (dt.datetime(1997, 2, 1, 0, 0, 0), 1.00),
        (dt.datetime(2000, 2, 29, 12, 0, 0), 99.99),
        (dt.datetime(2000, 3, 1, 0, 0, 0), 0.01),
    ]
    out = _run(rows)
    assert len(out) == 4  # Jan97, Feb97, Feb00, Mar00
    jan = next(r for r in out if "852076800000000" in r)
    assert "'n_orders': 2" in jan and "'total_price': 16.0" in jan
    assert _run(rows, parts=3) == out


@pytest.mark.usefixtures("ray_session")
def test_month_rollup_empty():
    assert _run([]) == []
