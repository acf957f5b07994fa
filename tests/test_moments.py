"""grouped_moments: hand-checked values, batch-order invariance, DuckDB
parity (bit-exact doubles through the stated expression chain)."""

from __future__ import annotations

import duckdb
import math

import pyarrow as pa


def _tbl():
    langs, vals = [], []
    for i in range(200):
        langs.append(["en", "fr", "de"][i % 3])
        vals.append(5 + (i * 13) % 97)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )


def _ref(tbl):
    by = {}
    for g, v in zip(tbl.column("lang").to_pylist(), tbl.column("n_chars").to_pylist()):
        by.setdefault(g, []).append(v)
    out = {}
    for g, vs in by.items():
        cnt, s, ss = len(vs), sum(vs), sum(v * v for v in vs)
        var = float(cnt * ss - s * s) / float(cnt * cnt)
        out[g] = (cnt, s, float(s) / cnt, var, math.sqrt(var))
    return out


def test_hand_checked_and_order_invariant(ray_session):
    import ray

    from uk_address_matcher_ray.stages.moments import grouped_moments

    tbl = _tbl()
    want = _ref(tbl)
    for ds in (
        ray.data.from_arrow(tbl),
        ray.data.from_arrow(tbl).repartition(17),
    ):
        rows = grouped_moments(ds, "n_chars", "lang").take_all()
        got = {
            r["lang"]: (r["n"], r["total"], r["mean"], r["var_pop"], r["std_pop"])
            for r in rows
        }
        assert got == want  # exact equality, including the doubles


def test_duckdb_parity(ray_session):
    import ray

    from uk_address_matcher_ray.stages.moments import (
        grouped_moments,
        grouped_moments_sql,
    )

    tbl = _tbl()
    rows = grouped_moments(ray.data.from_arrow(tbl), "n_chars", "lang").take_all()
    got = sorted(
        (r["lang"], r["n"], r["total"], r["mean"], r["var_pop"], r["std_pop"])
        for r in rows
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(
        tuple(r)
        for r in con.sql(grouped_moments_sql("n_chars", "lang")).fetchall()
    )
    assert got == want
