"""Sequence packing (stages/packing.py): brute-force parity, DuckDB
parity, partition/bucket invariance, window-shape invariants."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.packing import pack_sequences, pack_sequences_sql
from uk_address_matcher_ray.stages.sampling import sample_key

CAP = 50


def _docs(n=120, seed=7):
    import random

    rng = random.Random(seed)
    # zeros, tiny docs, and docs far larger than the capacity
    toks = [
        rng.choice([0, 1, 3, 17, CAP - 1, CAP, CAP + 1, 3 * CAP + 5])
        for _ in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "token_count": pa.array(toks, pa.int64()),
        }
    )


def _brute(tbl, cap):
    rows = sorted(
        (
            (sample_key(i), i, t)
            for i, t in zip(
                tbl.column("doc_id").to_pylist(),
                tbl.column("token_count").to_pylist(),
            )
        ),
    )
    out, pos = [], 0
    for _, i, t in rows:
        if t <= 0:
            continue
        s, e = pos, pos + t
        k = s // cap
        while k * cap < e:
            g0, g1 = max(k * cap, s), min((k + 1) * cap, e)
            out.append((k, i, g0 - s, g1 - g0, g0 - k * cap))
            k += 1
        pos = e
    return sorted(out)


def _run(tbl, parts, **kw):
    import ray

    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = pack_sequences(ds, CAP, **kw).take_all()
    return sorted(
        (r["seq_id"], r["doc_id"], r["doc_off"], r["seg_len"], r["win_off"])
        for r in out
    )


def test_matches_brute_force_and_is_partition_invariant(ray_session):
    tbl = _docs()
    want = _brute(tbl, CAP)
    got = _run(tbl, 7)
    assert got == want
    assert _run(tbl, 1) == want
    # bucket count must not change the result (order-preserving bucketing)
    assert _run(tbl, 5, num_buckets=3) == want
    assert _run(tbl, 5, num_buckets=257) == want


def test_matches_duckdb_oracle(ray_session):
    tbl = _docs(n=90, seed=11)
    got = _run(tbl, 6)
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = sorted(
        tuple(r)
        for r in con.execute(
            pack_sequences_sql(CAP, tokens_expr="token_count")
        ).fetchall()
    )
    assert got == ora


def test_window_shape_invariants(ray_session):
    tbl = _docs(n=150, seed=3)
    got = _run(tbl, 4)
    total = sum(tbl.column("token_count").to_pylist())
    # conservation: segments partition the token stream exactly
    assert sum(r[3] for r in got) == total
    by_win = {}
    for k, _i, _o, ln, off in got:
        by_win.setdefault(k, []).append((off, ln))
    max_win = max(by_win)
    for k, segs in by_win.items():
        segs.sort()
        # segments tile the window contiguously from offset 0
        pos = 0
        for off, ln in segs:
            assert off == pos and ln > 0
            pos += ln
        assert pos == CAP or (k == max_win and pos <= CAP)
    # every window id up to the last exists
    assert sorted(by_win) == list(range(max_win + 1))
