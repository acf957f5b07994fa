"""TPC-H Q1-style pricing summary: oracle parity on synthetic lineitem,
cents exactness, date filter, partition invariance."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.olap import (
    lineitem_pricing,
    lineitem_pricing_sql,
)


def _lineitem(n=200, seed=0):
    rng = np.random.RandomState(seed)
    base = dt.datetime(1998, 6, 1)
    return pa.table(
        {
            "l_returnflag": pa.array(
                rng.choice(["A", "N", "R"], n).tolist()
            ),
            "l_linestatus": pa.array(rng.choice(["F", "O"], n).tolist()),
            "l_quantity": pa.array(
                rng.randint(1, 51, n).astype(float)
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 100000, n), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.randint(0, 11, n) / 100.0, 2)
            ),
            "l_tax": pa.array(np.round(rng.randint(0, 9, n) / 100.0, 2)),
            "l_shipdate": pa.array(
                [
                    base + dt.timedelta(days=int(d))
                    for d in rng.randint(0, 200, n)
                ],
                pa.timestamp("us"),
            ),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_pricing_matches_oracle_and_is_partition_invariant():
    import ray

    t = _lineitem()
    key = lambda rows: sorted(
        rows, key=lambda r: (r["l_returnflag"], r["l_linestatus"])
    )
    out = key(lineitem_pricing(ray.data.from_arrow(t)).take_all())
    out13 = key(
        lineitem_pricing(ray.data.from_arrow(t).repartition(13)).take_all()
    )
    assert out == out13

    con = duckdb.connect()
    con.register("lineitem", t)
    exp = key(con.sql(lineitem_pricing_sql()).arrow().to_pylist())
    con.close()
    assert out == exp
    # the date filter bites: fewer rows aggregated than the table holds
    assert sum(r["n_rows"] for r in out) < t.num_rows
    # integral quantities survive the cents round-trip
    for r in out:
        assert abs(r["avg_qty"] * r["n_rows"] - r["sum_qty"]) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_pricing_empty_after_filter():
    import ray

    t = _lineitem(20)
    t = t.set_column(
        t.schema.get_field_index("l_shipdate"),
        "l_shipdate",
        pa.array([dt.datetime(2030, 1, 1)] * 20, pa.timestamp("us")),
    )
    assert lineitem_pricing(ray.data.from_arrow(t)).take_all() == []
