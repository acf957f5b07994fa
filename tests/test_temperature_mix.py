"""Temperature mixing: oracle parity, flattening property, isqrt
correction cases, determinism across runs."""

import math

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.sampling import (
    temperature_mix,
    temperature_mix_sql,
)


def _table(sizes):
    rows = []
    nid = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((g, nid))
            nid += 1
    return pa.table(
        {
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "source": pa.array([r[0] for r in rows], pa.string()),
        }
    )


def _run(sizes, total):
    import ray

    t = _table(sizes)
    out = (
        temperature_mix(ray.data.from_arrow(t), total=total)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = (
        con.sql(temperature_mix_sql(total=total))
        .df()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    con.close()
    if len(exp) == 0:
        assert len(out) == 0
    else:
        assert out.equals(exp[out.columns])
    return out


@pytest.mark.usefixtures("ray_session")
def test_temperature_mix_flattens_skew():
    sizes = {"head": 200, "mid": 50, "tail": 5}
    out = _run(sizes, 100)
    got = out.groupby("source").size().to_dict()
    # isqrt weights 14/7/2, sum 23
    assert got == {
        "head": 100 * 14 // 23,
        "mid": 100 * 7 // 23,
        "tail": min(5, 100 * 2 // 23),
    }
    # flattening: head/mid output ratio (2.0) < input ratio (4.0)
    assert got["head"] / got["mid"] < sizes["head"] / sizes["mid"]


@pytest.mark.usefixtures("ray_session")
def test_temperature_mix_isqrt_boundaries():
    # perfect squares and off-by-one sizes exercise the SQL isqrt
    # correction: 16 -> 4, 15 -> 3, 17 -> 4
    sizes = {"a": 16, "b": 15, "c": 17, "d": 1}
    out = _run(sizes, 30)
    w = {g: math.isqrt(n) for g, n in sizes.items()}
    s = sum(w.values())
    expect = {
        g: min(sizes[g], 30 * w[g] // s)
        for g in sizes
        if min(sizes[g], 30 * w[g] // s) > 0
    }
    assert out.groupby("source").size().to_dict() == expect


@pytest.mark.usefixtures("ray_session")
def test_temperature_mix_deterministic_and_empty():
    import ray

    sizes = {"a": 40, "b": 10}
    a = set(map(tuple, _run(sizes, 20)[["doc_id"]].values))
    b = set(map(tuple, _run(sizes, 20)[["doc_id"]].values))
    assert a == b
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
        }
    )
    assert temperature_mix(ray.data.from_arrow(empty), 10).take_all() == []
