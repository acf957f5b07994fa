"""Small-graph gate: the one-task local path must be bit-identical to
the exchange path for triangle_stats and kcore (the gate swaps execution
shape, never semantics)."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages import graph as G


def _edges(rng, n_nodes, n_edges):
    src, dst = [], []
    for _ in range(n_edges):
        a, b = rng.randint(0, n_nodes - 1), rng.randint(0, n_nodes - 1)
        src.append(f"h{a}")
        dst.append(f"h{b}")
    return pa.table(
        {
            "src": pa.array(src, pa.string()),
            "dst": pa.array(dst, pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_triangles_and_kcore_paths_agree(monkeypatch):
    import ray

    rng = random.Random(13)
    tbl = _edges(rng, 18, 120)  # dense enough for triangles + a 3-core
    ds = ray.data.from_arrow(tbl)

    via_small_t = sorted(map(repr, G.triangle_stats(ds).take_all()))
    via_small_k = sorted(map(repr, G.kcore(ds, k=3, rounds=3).take_all()))

    monkeypatch.setattr(G, "_SMALL_GRAPH_MAX_EDGES", 0)
    via_exch_t = sorted(map(repr, G.triangle_stats(ds).take_all()))
    via_exch_k = sorted(map(repr, G.kcore(ds, k=3, rounds=3).take_all()))

    assert via_small_t == via_exch_t
    assert via_small_k == via_exch_k
    # sanity: non-degenerate outputs
    row = eval(via_small_t[0])
    assert row["triangles"] > 0 and row["n_edges"] > 0
    assert len(via_small_k) > 0
