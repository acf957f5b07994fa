"""Exact-N sample: size exactness, oracle parity, partition
invariance, n > rows."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.sampling import (
    sample_exact_n,
    sample_exact_n_sql,
)


def _docs(n):
    return pa.table({"doc_id": pa.array(range(n), pa.int64())})


@pytest.mark.usefixtures("ray_session")
def test_exact_n_parity_and_invariance():
    import ray

    t = _docs(500)
    one = sample_exact_n(ray.data.from_arrow(t), 37).take_all()
    many = sample_exact_n(
        ray.data.from_arrow(t).repartition(11), 37
    ).take_all()
    assert len(one) == 37
    assert sorted(map(repr, one)) == sorted(map(repr, many))

    con = duckdb.connect()
    con.register("documents", t)
    exp = con.sql(sample_exact_n_sql(37)).arrow().to_pylist()
    con.close()
    assert sorted(map(repr, one)) == sorted(map(repr, exp))


@pytest.mark.usefixtures("ray_session")
def test_exact_n_larger_than_table_and_empty():
    import ray

    out = sample_exact_n(ray.data.from_arrow(_docs(5)), 100).take_all()
    assert len(out) == 5
    out = sample_exact_n(ray.data.from_arrow(_docs(0)), 10).take_all()
    assert out == []
