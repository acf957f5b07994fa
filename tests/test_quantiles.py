"""Exact grouped quantiles (stages/quantiles.py): hand-computed example,
DuckDB-oracle parity, partition invariance, global path."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.quantiles import (
    grouped_quantiles,
    grouped_quantiles_sql,
)

QS = [0.25, 0.5, 0.9, 0.99]


def _corpus(n=500):
    import random

    rng = random.Random(3)
    rows = [
        (i, ["en", "de", "fr"][i % 3], rng.randrange(0, 40)) for i in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _run(tbl, parts, group_col="lang"):
    import ray

    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = grouped_quantiles(ds, QS, "n_chars", group_col).take_all()
    return sorted((r["g"], r["q"], r["value"], r["n"]) for r in out)


def test_known_tiny_example(ray_session):
    import ray

    tbl = pa.table(
        {
            "lang": pa.array(["a"] * 4, pa.string()),
            "n_chars": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    out = {
        r["q"]: r["value"]
        for r in grouped_quantiles(
            ray.data.from_arrow(tbl), [0.25, 0.5, 0.75, 1.0], "n_chars", "lang"
        ).take_all()
    }
    # type-1: smallest v with cum >= ceil(q*4)
    assert out == {0.25: 10, 0.5: 20, 0.75: 30, 1.0: 40}


def test_matches_duckdb_oracle(ray_session):
    tbl = _corpus()
    got = _run(tbl, 7)
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = sorted(
        tuple(r)
        for r in con.execute(
            grouped_quantiles_sql(QS, "n_chars", "lang")
        ).fetchall()
    )
    assert got == ora


def test_partition_invariant(ray_session):
    tbl = _corpus()
    assert _run(tbl, 1) == _run(tbl, 11)


def test_global_quantiles(ray_session):
    import ray

    tbl = _corpus()
    out = grouped_quantiles(
        ray.data.from_arrow(tbl).repartition(5), [0.5], "n_chars", None
    ).take_all()
    assert len(out) == 1 and out[0]["g"] == "__all__" and out[0]["n"] == 500
    import math

    vals = sorted(tbl.column("n_chars").to_pylist())
    assert out[0]["value"] == vals[math.ceil(0.5 * 500) - 1]
