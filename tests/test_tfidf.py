"""tfidf_topk: hand-checked scores, floor semantics, DuckDB parity."""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pytest


DOCS = [
    ("d1", "alpha beta beta gamma"),
    ("d2", "alpha beta delta"),
    ("d3", "alpha epsilon epsilon epsilon"),
    ("d4", None),
    ("d5", "  Alpha   BETA  "),
]


def _tbl() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.string()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )


def test_scores_hand_checked(ray_session):
    import ray

    from uk_address_matcher_ray.stages.tfidf import tfidf_topk

    rows = tfidf_topk(ray.data.from_arrow(_tbl()), k=2).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["score"]))
    # d1: beta tf=2 df=3, gamma tf=1 df=1, alpha tf=1 df=4; N=5
    assert [t for _, t, _ in sorted(by_doc["d1"])] == ["gamma", "beta"]
    assert by_doc["d1"][0][2] == pytest.approx(math.log(5 / 1))
    # d3: epsilon tf=3 df=1 dominates
    assert sorted(by_doc["d3"])[0][1] == "epsilon"
    assert "d4" not in by_doc  # token-less doc emits nothing
    # d5 lowercases/trims: alpha+beta, both df>=3 — ties break token asc
    assert [t for _, t, _ in sorted(by_doc["d5"])] == ["beta", "alpha"]


def test_duckdb_parity(ray_session):
    import ray

    from uk_address_matcher_ray.stages.tfidf import tfidf_topk, tfidf_topk_sql

    got = sorted(
        (r["doc_id"], r["token"], r["rank"], r["score"])
        for r in tfidf_topk(ray.data.from_arrow(_tbl()), k=3).take_all()
    )
    con = duckdb.connect()
    con.register("documents", _tbl())
    want = sorted(tuple(r) for r in con.sql(tfidf_topk_sql(k=3)).fetchall())
    assert got == want


def test_min_df_floor_drops_hapaxes(ray_session):
    import ray

    from uk_address_matcher_ray.stages.tfidf import corpus_df_assets, tfidf_topk

    ds = ray.data.from_arrow(_tbl())
    df, n = corpus_df_assets(ds, min_df=2)
    assert n == 5
    assert "gamma" not in df and "alpha" in df
    rows = tfidf_topk(ds, k=3, df_assets=(df, n)).take_all()
    assert all(r["token"] != "gamma" for r in rows)
