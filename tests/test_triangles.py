"""Triangle counting: known graphs, brute-force differential, oracle
parity, degree-orientation invariants."""

import itertools
import random

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.graph import (
    triangle_stats,
    triangle_stats_sql,
)


def _run(pairs):
    import ray

    t = pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.string()),
            "dst": pa.array([b for _, b in pairs], pa.string()),
        }
    )
    out = triangle_stats(ray.data.from_arrow(t)).take_all()[0]
    con = duckdb.connect()
    con.register("edges_in", t)
    exp = con.sql(
        triangle_stats_sql("SELECT src, dst FROM edges_in")
    ).arrow().to_pylist()[0]
    con.close()
    return out, exp


def _brute(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({n for p in und for n in p})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )


@pytest.mark.usefixtures("ray_session")
def test_known_graphs():
    k4 = list(itertools.combinations("abcd", 2))
    out, exp = _run(k4)
    assert out == exp == {"n_nodes": 4, "n_edges": 6, "triangles": 4}

    # ring has no triangles; dup/reversed/self edges are simplified away
    ring = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a"),
            ("b", "a"), ("a", "a")]
    out, exp = _run(ring)
    assert out == exp == {"n_nodes": 5, "n_edges": 5, "triangles": 0}

    # star (hub) graph: worst case for name-only orientation, zero
    # triangles either way
    star = [("hub", f"leaf{i}") for i in range(20)]
    out, exp = _run(star)
    assert out == exp
    assert out["triangles"] == 0 and out["n_nodes"] == 21


@pytest.mark.usefixtures("ray_session")
def test_random_graphs_vs_brute_force():
    random.seed(11)
    for trial in range(3):
        nodes = [f"n{i}" for i in range(10 + trial * 4)]
        pairs = [
            (random.choice(nodes), random.choice(nodes))
            for _ in range(50 + trial * 30)
        ]
        out, exp = _run(pairs)
        assert out == exp
        assert out["triangles"] == _brute(pairs)


@pytest.mark.usefixtures("ray_session")
def test_empty_graph():
    out, exp = _run([])
    assert out == exp == {"n_nodes": 0, "n_edges": 0, "triangles": 0}
