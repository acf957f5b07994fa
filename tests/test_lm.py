"""Bigram-LM perplexity (stages/lm.py): local-reference parity, DuckDB
oracle parity, floor contract, unseen-input smoothing."""

import math

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.dedup import _tokens
from uk_address_matcher_ray.stages.lm import (
    SMOOTH_A,
    corpus_lm_assets,
    lm_perplexity,
    lm_perplexity_sql,
    score_perplexity,
)


def _corpus(n=200):
    import random

    rng = random.Random(11)
    vocab = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "Fast"] + [
        f"w{i}" for i in range(60)
    ]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25)))) for i in range(n)]
    rows.append((n, ""))  # 0 tokens
    rows.append((n + 1, "solo"))  # 1 token -> NULL perplexity
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _local_assets(tbl):
    bigrams, ctx, vocab = {}, {}, set()
    for t in tbl.column("text").to_pylist():
        toks = _tokens(t)
        vocab.update(toks)
        for i in range(1, len(toks)):
            k = (toks[i - 1], toks[i])
            bigrams[k] = bigrams.get(k, 0) + 1
            ctx[toks[i - 1]] = ctx.get(toks[i - 1], 0) + 1
    return bigrams, ctx, len(vocab)


def _local_ppl(toks, bigrams, ctx, v, a=SMOOTH_A):
    terms = [
        math.log(
            (bigrams.get((toks[i - 1], toks[i]), 0) + a)
            / (ctx.get(toks[i - 1], 0) + a * v)
        )
        for i in range(1, len(toks))
    ]
    return round(math.exp(-math.fsum(terms) / len(terms)), 6)


def test_assets_match_local(ray_session):
    import ray

    tbl = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(7)
    bigrams, ctx, v = corpus_lm_assets(ds)
    lb, lc, lv = _local_assets(tbl)
    assert bigrams == lb and ctx == lc and v == lv


def test_floor_keeps_surviving_probs_bit_identical(ray_session):
    import ray

    tbl = _corpus()
    ds = ray.data.from_arrow(tbl)
    b0, c0, v0 = corpus_lm_assets(ds, min_count=0)
    b2, c2, v2 = corpus_lm_assets(ds, min_count=3)
    assert (c2, v2) == (c0, v0)  # denominators pre-floor
    assert b2 == {k: c for k, c in b0.items() if c >= 3}
    assert len(b2) < len(b0)  # the corpus has singleton bigrams


def test_perplexity_matches_duckdb_oracle(ray_session):
    import ray

    tbl = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = (
        pa.concat_tables(ray.get(lm_perplexity(ds).to_arrow_refs()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = (
        con.execute(lm_perplexity_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["n_bigrams"] == ora["n_bigrams"]).all()
    assert out["perplexity"].isna().equals(ora["perplexity"].isna())
    both = out["perplexity"].notna()
    assert (out.loc[both, "perplexity"] == ora.loc[both, "perplexity"]).all()
    # short docs: 0/1 tokens -> NULL
    assert out.set_index("doc_id").loc[201, "n_bigrams"] == 0


def test_unseen_bigrams_score_smoothed(ray_session):
    import ray

    train = _corpus()
    assets = _local_assets(train)
    other = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["unseen words here", "the cat sat"], pa.string()),
        }
    )
    out = {
        r["doc_id"]: r["perplexity"]
        for r in score_perplexity(
            ray.data.from_arrow(other), assets
        ).take_all()
    }
    b, c, v = assets
    assert out[0] == _local_ppl(["unseen", "words", "here"], b, c, v)
    assert out[1] == _local_ppl(["the", "cat", "sat"], b, c, v)
    # fully-unseen text scores the smoothed-zero ceiling exactly: every
    # term is a/(a*V) = 1/V, so ppl = V
    assert out[0] == float(v)
