"""HLL distinct sketch: rho spec, accuracy vs exact distinct, batch-order
invariance, DuckDB parity (bit-exact including the estimate doubles)."""

from __future__ import annotations

import duckdb
import pyarrow as pa


def _tbl(n_docs: int = 150):
    langs, texts = [], []
    for i in range(n_docs):
        langs.append(["en", "fr"][i % 2])
        # ~40 distinct tokens per doc with heavy cross-doc overlap
        toks = [f"w{(i * 13 + j * 7) % 900}" for j in range(40)]
        texts.append(" ".join(toks))
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _exact_distinct(tbl):
    from uk_address_matcher_ray.stages.dedup import _tokens

    seen = {}
    for g, t in zip(tbl.column("lang").to_pylist(), tbl.column("text").to_pylist()):
        seen.setdefault(g, set()).update(_tokens(t))
    return {g: len(s) for g, s in seen.items()}


def test_rho_spec():
    from uk_address_matcher_ray.stages.hll import W_BITS, RHO_MAX, _rho

    assert _rho(0) == RHO_MAX
    assert _rho(1) == W_BITS
    assert _rho(1 << (W_BITS - 1)) == 1
    assert _rho((1 << W_BITS) - 1) == 1
    assert _rho(3) == W_BITS - 1


def test_accuracy_and_order_invariance(ray_session):
    import ray

    from uk_address_matcher_ray.stages.hll import hll_distinct_tokens

    tbl = _tbl()
    want = _exact_distinct(tbl)
    est1 = {
        r["lang"]: r["estimate"]
        for r in hll_distinct_tokens(ray.data.from_arrow(tbl)).take_all()
    }
    est2 = {
        r["lang"]: r["estimate"]
        for r in hll_distinct_tokens(
            ray.data.from_arrow(tbl).repartition(13)
        ).take_all()
    }
    assert est1 == est2  # max-merge: identical at any batching
    for g, true in want.items():
        assert abs(est1[g] - true) / true < 0.05, (g, est1[g], true)


def test_duckdb_parity(ray_session):
    import ray

    from uk_address_matcher_ray.stages.hll import (
        hll_distinct_tokens,
        hll_distinct_tokens_sql,
    )

    tbl = _tbl(60)
    rows = hll_distinct_tokens(ray.data.from_arrow(tbl)).take_all()
    got = sorted((r["lang"], r["zeros"], r["s"], r["estimate"]) for r in rows)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(tuple(r) for r in con.sql(hll_distinct_tokens_sql()).fetchall())
    assert got == want
