"""JL projection: oracle parity, distance-preservation sanity,
determinism, zero vectors."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.pca import jl_project, jl_project_sql

DIM = 8


def _vecs(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, DIM).astype(np.float32)


def _table(v):
    return pa.table(
        {
            "vec_id": pa.array(range(len(v)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in v],
                pa.list_(pa.float32()),
            ),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_jl_oracle_parity_and_determinism():
    import ray

    t = _table(_vecs(30))
    out = {
        r["vec_id"]: list(r["proj"])
        for r in jl_project(
            ray.data.from_arrow(t), k=4, dim=DIM
        ).take_all()
    }
    again = {
        r["vec_id"]: list(r["proj"])
        for r in jl_project(
            ray.data.from_arrow(t).repartition(7), k=4, dim=DIM
        ).take_all()
    }
    assert out == again  # partition-invariant

    con = duckdb.connect()
    con.register("embeddings", t)
    exp = {
        r["vec_id"]: list(r["proj"])
        for r in con.sql(
            jl_project_sql(k=4, dim=DIM)
        ).arrow().to_pylist()
    }
    con.close()
    assert out == exp


@pytest.mark.usefixtures("ray_session")
def test_jl_preserves_relative_distances_roughly():
    import ray

    v = _vecs(40, seed=3)
    t = _table(v)
    out = jl_project(ray.data.from_arrow(t), k=6, dim=DIM).take_all()
    proj = np.array(
        [r["proj"] for r in sorted(out, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    ) / (1 << 20)
    # JL with +-1 signs preserves E[<x,y>] up to scaling k; check the
    # projected norms correlate with original norms (loose sanity, not a
    # concentration bound)
    on = (v.astype(np.float64) ** 2).sum(1)
    pn = (proj ** 2).sum(1) / 6
    corr = np.corrcoef(on, pn)[0, 1]
    assert corr > 0.3


@pytest.mark.usefixtures("ray_session")
def test_jl_zero_vector_maps_to_zero():
    import ray

    t = _table(np.zeros((2, DIM), dtype=np.float32))
    out = jl_project(ray.data.from_arrow(t), k=5, dim=DIM).take_all()
    assert all(list(r["proj"]) == [0] * 5 for r in out)
