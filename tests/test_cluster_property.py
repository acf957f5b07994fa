"""Hypothesis gate for connected components: propagate_labels vs an
in-test union-find on random graphs (duplicate edges, self-loops,
singleton pairs, chains) — broadcast path, arbitrary block layouts."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # component label = lexicographic min member
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        lab = min(members)
        for m in members:
            out[m] = lab
    return out


@pytest.mark.usefixtures("ray_session")
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    ),
    block_rows=st.integers(3, 17),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_propagate_labels_matches_union_find(edges, block_rows):
    import ray

    from uk_address_matcher_ray.stages.cluster import propagate_labels

    named = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges]
    src = [a for a, b in named] + [b for a, b in named]
    dst = [b for a, b in named] + [a for a, b in named]
    tbl = pa.table(
        {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
    )
    slices = [tbl.slice(i, block_rows) for i in range(0, tbl.num_rows, block_rows)]
    got = {
        r["node"]: r["label"]
        for r in propagate_labels(ray.data.from_arrow(slices)).take_all()
    }
    assert got == _union_find_labels(named)
