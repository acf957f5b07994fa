"""TPC-H-Q5-shape 3-hop join: hand-built micro-case, oracle parity at
sf0.001, partition invariance."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.olap import (
    revenue_by_nation,
    revenue_by_nation_sql,
)


def _tables():
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1], pa.int64()),
            "n_name": ["ALPHA", "BETA"],
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array([10, 11, 12], pa.int64()),
            "c_nationkey": pa.array([0, 1, 0], pa.int64()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
            "o_custkey": pa.array([10, 11, 12, 99], pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(
                [100, 100, 101, 102, 103, 999], pa.int64()
            ),
            "l_extendedprice": pa.array(
                [100.0, 200.0, 50.0, 10.0, 7.0, 1000.0]
            ),
            "l_discount": pa.array([0.1, 0.0, 0.05, 0.0, 0.0, 0.0]),
        }
    )
    return lineitem, orders, customer, nation


def _run(parts=1):
    import ray

    li, o, c, n = _tables()
    dli, do = ray.data.from_arrow(li), ray.data.from_arrow(o)
    dc, dn = ray.data.from_arrow(c), ray.data.from_arrow(n)
    if parts > 1:
        dli, do = dli.repartition(parts), do.repartition(parts)
        dc = dc.repartition(parts)
    out = sorted(
        map(repr, revenue_by_nation(dli, do, dc, dn).take_all())
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", o)
    con.register("customer", c)
    con.register("nation", n)
    exp = sorted(
        map(repr, con.sql(revenue_by_nation_sql()).arrow().to_pylist())
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_q5_micro_case_and_invariance():
    out = _run()
    # ALPHA: order 100 (90 + 200) + order 102 (10) = 300.0 over 3 lines;
    # BETA: order 101 (47.5); order 103 has no customer; line 999 has no
    # order — both dropped
    assert out == [
        "{'n_name': 'ALPHA', 'n_lineitems': 3, 'revenue': 300.0}",
        "{'n_name': 'BETA', 'n_lineitems': 1, 'revenue': 47.5}",
    ]
    assert _run(parts=4) == out


@pytest.mark.usefixtures("ray_session")
def test_q5_sf0001_oracle():
    import os

    import ray

    SF = "/root/testdata/sf0.001"
    if not os.path.isdir(SF):
        pytest.skip("testdata not available")
    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    o = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    c = ray.data.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    n = ray.data.read_parquet(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    out = sorted(map(repr, revenue_by_nation(li, o, c, n).take_all()))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    exp = sorted(
        map(repr, con.sql(revenue_by_nation_sql()).arrow().to_pylist())
    )
    con.close()
    assert out == exp and len(out) == 25
