"""Link-graph operators (stages/graph.py): split-contract href
extraction and integer-domain PageRank."""

from __future__ import annotations

import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.graph import (
    _DAMP_DEN,
    _DAMP_NUM,
    _SCALE,
    extract_links,
    link_hosts,
    pagerank,
)


def _links_of(rows):
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "html": pa.array(rows, pa.string()),
            }
        )
    )
    out = extract_links(ds).take_all()
    return sorted((r["doc_id"], r["link"]) for r in out)


@pytest.mark.usefixtures("ray_session")
def test_extract_links_split_contract():
    rows = [
        '<a href="https://a.com/x">one</a> <a href="https://b.com/">two</a>',
        'no links here',
        'unterminated href="https://c.com/x with no quote',
        # split consumes every 'href="' occurrence: the fragment after
        # the first one ends at the second occurrence and has no closing
        # quote, so only the second link survives
        'href="https://d.com/x href="https://e.com/y"',
        '',
        None,
        'HREF="https://upper.com/" is case-sensitive, skipped',
    ]
    assert _links_of(rows) == [
        (0, "https://a.com/x"),
        (0, "https://b.com/"),
        (3, "https://e.com/y"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_link_hosts_full_split():
    hosts = link_hosts(
        pa.array(
            [
                "https://a.example.com/x/y?q=1",
                "http://b.com",
                # full '://' split (split_part semantics): element 1 of
                # ['ftp','weird','host/p'] is 'weird'
                "ftp://weird://host/p",
            ]
        )
    )
    assert hosts.to_pylist() == ["a.example.com", "b.com", "weird"]


def _pagerank_spec(edges, iters, scale=_SCALE, dn=_DAMP_NUM, dd=_DAMP_DEN):
    """Direct single-process restatement of the integer spec."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    od = {n: 0 for n in nodes}
    for s, _ in edges:
        od[s] += 1
    n = len(nodes)
    base = scale // n
    r = {v: base for v in nodes}
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // od[s]
        r = {v: ((dd - dn) * base + dn * inc[v]) // dd for v in nodes}
    return r


def _run_pagerank(edges, iters):
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.string()),
                "dst": pa.array([d for _, d in edges], pa.string()),
            }
        )
    )
    out = pagerank(ds, iters=iters).take_all()
    return {r["node"]: r["rank_scaled"] for r in out}


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_spec():
    edges = [
        ("a", "b"),
        ("b", "a"),
        ("a", "c"),
        ("c", "a"),
        ("d", "a"),  # d is dangling-in (no in-edges): floor rank
        ("a", "b"),  # multi-edge: counts with multiplicity
    ]
    for iters in (0, 1, 3):
        got = _run_pagerank(edges, iters)
        want = _pagerank_spec(edges, iters)
        assert got == want, (iters, got, want)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_floor_and_rank_column():
    import ray

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges]),
                "dst": pa.array([d for _, d in edges]),
            }
        )
    )
    rows = pagerank(ds, iters=2).take_all()
    base = _SCALE // 3
    floor = (_DAMP_DEN - _DAMP_NUM) * base // _DAMP_DEN
    for r in rows:
        assert r["rank_scaled"] >= floor
        assert r["rank"] == r["rank_scaled"] / float(_SCALE)
    # a 3-cycle with equal degrees stays (near-)uniform
    ranks = {r["node"]: r["rank_scaled"] for r in rows}
    assert max(ranks.values()) - min(ranks.values()) <= 1


@pytest.mark.usefixtures("ray_session")
def test_pagerank_empty_edges():
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
            }
        )
    )
    assert pagerank(ds, iters=2).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_pagerank_sharded_parity():
    """The beyond-gate sharded path is bit-identical to the broadcast
    path (and to the spec) on a multi-edge graph with dangling-in and
    dangling-out nodes."""
    import random

    import ray

    rng = random.Random(11)
    nodes = [f"h{i}" for i in range(13)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges += [("h0", "h1"), ("h0", "h1"), ("sink_in", "h0")]

    def run(gate):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([s for s, _ in edges]),
                    "dst": pa.array([d for _, d in edges]),
                }
            )
        ).repartition(4)
        rows = pagerank(ds, iters=3, broadcast_max_nodes=gate).take_all()
        return sorted(
            (r["node"], r["rank_scaled"], r["rank"]) for r in rows
        )

    broadcast = run(10**6)
    sharded = run(0)  # force the sharded path
    assert broadcast == sharded
    want = _pagerank_spec(edges, 3)
    assert {n: r for n, r, _ in sharded} == want


@pytest.mark.usefixtures("ray_session")
def test_pagerank_random_graph_property():
    """Randomized-but-seeded graph vs the spec restatement."""
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(17)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    got = _run_pagerank(edges, 4)
    want = _pagerank_spec(edges, 4)
    assert got == want


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def _hits_brute(edge_list, iters=3, q=1 << 20):
    nodes = sorted({s for s, _ in edge_list} | {d for _, d in edge_list})
    h = {n: q for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iters):
        a = {n: 0 for n in nodes}
        for s, d in edge_list:
            a[d] += h[s]
        m = max(max(a.values(), default=0), 1)
        a = {n: v * q // m for n, v in a.items()}
        h = {n: 0 for n in nodes}
        for s, d in edge_list:
            h[s] += a[d]
        m = max(max(h.values(), default=0), 1)
        h = {n: v * q // m for n, v in h.items()}
    return a, h


def _edges_ds(edge_list, blocks=3):
    from uk_address_matcher_ray.util import dataset_from_table

    return dataset_from_table(
        pa.table(
            {
                "src": pa.array([s for s, _ in edge_list], pa.string()),
                "dst": pa.array([d for _, d in edge_list], pa.string()),
            }
        ),
        target_blocks=blocks,
    )


@pytest.mark.usefixtures("ray_session")
def test_hits_matches_spec():
    from uk_address_matcher_ray.stages.graph import hits

    edges = [
        ("hub1", "auth1"), ("hub1", "auth2"), ("hub1", "auth3"),
        ("hub2", "auth1"), ("hub2", "auth2"),
        ("auth1", "auth2"),  # authorities can also point
        ("lone", "auth1"),
        ("hub1", "auth1"),  # multi-edge counts with multiplicity
    ]
    out = {r["node"]: r for r in hits(_edges_ds(edges), iters=3).take_all()}
    a_ref, h_ref = _hits_brute(edges)
    assert {n: r["auth_scaled"] for n, r in out.items()} == a_ref
    assert {n: r["hub_scaled"] for n, r in out.items()} == h_ref
    # hub1 is the best hub, auth1/auth2 the best authorities
    best_hub = max(out.values(), key=lambda r: r["hub_scaled"])
    assert best_hub["node"] == "hub1" and best_hub["hub_scaled"] == 1 << 20
    best_auth = max(out.values(), key=lambda r: r["auth_scaled"])
    assert best_auth["node"] == "auth1" and best_auth["auth_scaled"] == 1 << 20
    # float columns are the exact power-of-two division
    for r in out.values():
        assert r["auth"] == r["auth_scaled"] / float(1 << 20)


@pytest.mark.usefixtures("ray_session")
def test_hits_partitioning_invariance_and_oracle():
    import duckdb

    from uk_address_matcher_ray.stages.graph import hits, hits_sql

    rng = __import__("random").Random(5)
    edges = [
        (f"n{rng.randrange(12)}", f"n{rng.randrange(12)}") for _ in range(80)
    ]
    a = sorted(
        (r["node"], r["auth_scaled"], r["hub_scaled"])
        for r in hits(_edges_ds(edges, blocks=2), iters=3).take_all()
    )
    b = sorted(
        (r["node"], r["auth_scaled"], r["hub_scaled"])
        for r in hits(_edges_ds(edges, blocks=7), iters=3).take_all()
    )
    assert a == b
    con = duckdb.connect()
    con.register(
        "e",
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.string()),
                "dst": pa.array([d for _, d in edges], pa.string()),
            }
        ),
    )
    orc = sorted(
        (r[0], int(r[1]), int(r[2]))
        for r in con.sql(
            hits_sql("SELECT src, dst FROM e", iters=3)
        ).fetchall()
    )
    assert a == orc
