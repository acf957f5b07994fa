"""k-core peeling: known cores, cascade peeling, fixed-round contract,
oracle parity on random graphs."""

import itertools
import random

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.graph import kcore, kcore_sql


def _run(pairs, k=2, rounds=4):
    import ray

    t = pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.string()),
            "dst": pa.array([b for _, b in pairs], pa.string()),
        }
    )
    out = sorted(
        (r["node"], r["deg"])
        for r in kcore(
            ray.data.from_arrow(t), k=k, rounds=rounds
        ).take_all()
    )
    con = duckdb.connect()
    con.register("edges_in", t)
    exp = sorted(
        (r["node"], r["deg"])
        for r in con.sql(
            kcore_sql("SELECT src, dst FROM edges_in", k=k, rounds=rounds)
        ).arrow().to_pylist()
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_triangle_with_tail_is_the_2core():
    g = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    assert _run(g) == [("a", 2), ("b", 2), ("c", 2)]


@pytest.mark.usefixtures("ray_session")
def test_chain_peels_to_nothing():
    assert _run([("a", "b"), ("b", "c"), ("c", "d")]) == []


@pytest.mark.usefixtures("ray_session")
def test_cascade_needs_multiple_rounds():
    # long pendant path off a triangle: each round removes one tail node,
    # so round count visibly gates the peel depth
    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    path = [("c", "p1"), ("p1", "p2"), ("p2", "p3"), ("p3", "p4")]
    after1 = _run(tri + path, k=2, rounds=1)
    aftermany = _run(tri + path, k=2, rounds=4)
    assert {n for n, _ in aftermany} == {"a", "b", "c"}
    assert {n for n, _ in after1} > {n for n, _ in aftermany}


@pytest.mark.usefixtures("ray_session")
def test_k3_core_and_random_parity():
    g3 = list(itertools.combinations("abcde", 2)) + [
        ("a", "x"), ("x", "y"), ("e", "z")
    ]
    out = _run(g3, k=3)
    assert sorted(n for n, _ in out) == list("abcde")
    assert all(d >= 3 for _, d in out)

    random.seed(5)
    nodes = [f"n{i}" for i in range(15)]
    pairs = [
        (random.choice(nodes), random.choice(nodes)) for _ in range(40)
    ]
    out = _run(pairs, k=2, rounds=5)
    # converged 2-core invariant: every survivor has deg >= 2
    assert all(d >= 2 for _, d in out)


@pytest.mark.usefixtures("ray_session")
def test_kcore_empty():
    assert _run([]) == []
