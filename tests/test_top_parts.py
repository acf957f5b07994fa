"""Top-k by aggregated revenue: integer tie-break, k > groups, oracle
parity at sf0.001."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.olap import (
    top_parts_by_revenue,
    top_parts_by_revenue_sql,
)


def _run(t, k, parts=1):
    import ray

    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = [
        (r["l_partkey"], r["revenue"])
        for r in top_parts_by_revenue(ds, k=k).take_all()
    ]
    con = duckdb.connect()
    con.register("lineitem", t)
    exp = [
        (r["l_partkey"], r["revenue"])
        for r in con.sql(top_parts_by_revenue_sql(k=k)).arrow().to_pylist()
    ]
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_top_parts_ties_and_small_k():
    t = pa.table(
        {
            "l_partkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "l_extendedprice": pa.array([50.0, 50.0, 100.0, 100.0, 1.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0]),
        }
    )
    # parts 1, 2, 3 all have revenue 100.0 -> tie-break on partkey asc
    out = _run(t, 2)
    assert out == [(1, 100.0), (2, 100.0)]
    assert _run(t, 2, parts=4) == out
    # k exceeding group count returns everything
    assert len(_run(t, 10)) == 4


@pytest.mark.usefixtures("ray_session")
def test_top_parts_sf0001():
    import os

    import ray

    SF = "/root/testdata/sf0.001"
    if not os.path.isdir(SF):
        pytest.skip("testdata not available")
    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    out = top_parts_by_revenue(li, k=10).take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    exp = con.sql(top_parts_by_revenue_sql(k=10)).arrow().to_pylist()
    con.close()
    assert [tuple(r.values()) for r in out] == [
        tuple(r.values()) for r in exp
    ]
