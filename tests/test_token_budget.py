"""token_budget_cap: prefix semantics vs a loop reference, batch-prune
safety (block-order invariance), and DuckDB parity."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.sampling import sample_key


def _docs(n: int = 60):
    rows = []
    for i in range(n):
        rows.append((f"d{i}", ["en", "fr", "de"][i % 3], 10 + (i * 7) % 90))
    return rows


def _ref_keep(rows, budget: int):
    """Loop restatement: per group, md5-rank order, keep while the
    inclusive running sum stays <= budget."""
    keep = set()
    by_g = {}
    for did, g, tok in rows:
        by_g.setdefault(g, []).append((sample_key(did), did, tok))
    for g, items in by_g.items():
        run = 0
        for key, did, tok in sorted(items):
            run += tok
            if run <= budget:
                keep.add(did)
    return keep


def _tbl(rows) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "token_count": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


@pytest.mark.parametrize("budget", [0, 35, 300, 10_000])
def test_matches_loop_reference(ray_session, budget):
    import ray

    from uk_address_matcher_ray.stages.sampling import token_budget_cap

    rows = _docs()
    out = token_budget_cap(
        ray.data.from_arrow(_tbl(rows)), budget=budget
    ).take_all()
    assert {r["doc_id"] for r in out} == _ref_keep(rows, budget)
    # emitted token counts ride through unchanged
    toks = {r[0]: r[2] for r in rows}
    assert all(r["token_count"] == toks[r["doc_id"]] for r in out)


def test_block_order_invariance(ray_session):
    """The partial prune must not depend on how rows are batched: tiny
    blocks (every row its own batch) give the same survivors."""
    import ray

    from uk_address_matcher_ray.stages.sampling import token_budget_cap

    rows = _docs(40)
    one = token_budget_cap(
        ray.data.from_arrow(_tbl(rows)), budget=120
    ).take_all()
    shredded = token_budget_cap(
        ray.data.from_arrow(_tbl(rows[::-1])).repartition(20), budget=120
    ).take_all()
    key = lambda r: (r["doc_id"], r["lang"], r["token_count"])
    assert sorted(map(key, one)) == sorted(map(key, shredded))


def test_duckdb_parity(ray_session):
    import ray

    from uk_address_matcher_ray.stages.sampling import (
        token_budget_cap,
        token_budget_cap_sql,
    )

    rows = _docs(45)
    got = sorted(
        (r["doc_id"], r["lang"], r["token_count"], r["sample_key"])
        for r in token_budget_cap(
            ray.data.from_arrow(_tbl(rows)), budget=150
        ).take_all()
    )
    con = duckdb.connect()
    con.register("documents", _tbl(rows))
    want = sorted(
        tuple(r)
        for r in con.sql(token_budget_cap_sql(150)).fetchall()
    )
    assert got == want
