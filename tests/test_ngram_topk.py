"""Top-k n-grams per group (stages/ngram_topk.py): DuckDB parity,
partition invariance, tie-break determinism."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.ngram_topk import ngram_topk, ngram_topk_sql

K = 4


def _corpus(n=180):
    import random

    rng = random.Random(13)
    vocab = ["the", "cat", "sat", "mat", "dog", "big", "run"]
    rows = [
        (
            i,
            ["en", "de"][i % 2],
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15))),
        )
        for i in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _run(tbl, parts):
    import ray

    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = ngram_topk(ds, K, n=2).take_all()
    return sorted((r["g"], r["gram"], r["cnt"]) for r in out)


def test_matches_duckdb_oracle_and_partition_invariant(ray_session):
    tbl = _corpus()
    got = _run(tbl, 7)
    assert got == _run(tbl, 1)
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = sorted(tuple(r) for r in con.execute(ngram_topk_sql(K, n=2)).fetchall())
    assert got == ora
    assert len(got) == 2 * K  # both groups filled their k


def test_tie_break_is_gram_ascending(ray_session):
    import ray

    # equal counts force the ORDER BY gram ASC tie-break
    tbl = pa.table(
        {
            "lang": pa.array(["en"] * 3, pa.string()),
            "text": pa.array(["b b", "a a", "c c"], pa.string()),
        }
    )
    out = ngram_topk(ray.data.from_arrow(tbl), 2, n=2).take_all()
    assert [(r["gram"], r["cnt"]) for r in sorted(out, key=lambda r: r["gram"])] == [
        ("a a", 1),
        ("b b", 1),
    ]


def test_approx_equals_exact_on_skewed_corpus(ray_session):
    """CMS + candidate re-count reproduces the exact top-k on a zipf-ish
    corpus, at any batching."""
    import ray

    from uk_address_matcher_ray.stages.ngram_topk import (
        ngram_topk,
        ngram_topk_approx,
    )

    words = ["the", "data", "batch", "query", "spark", "row", "agg", "key"]
    rows = []
    for i in range(120):
        # heavy phrases repeat with zipf-ish frequency; tail is unique-ish
        head = " ".join(words[: 2 + i % 3] * (1 + (i % 7 == 0) * 3))
        tail = f"tok{i} tok{i * 31 % 97}"
        rows.append((["en", "fr"][i % 2], head + " " + tail))
    tbl = pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(9)
    exact = sorted(
        (r["g"], r["gram"], r["cnt"]) for r in ngram_topk(ds, 4, n=2).take_all()
    )
    approx = ngram_topk_approx(ds, 4, n=2)
    got = sorted(
        zip(
            approx.column("g").to_pylist(),
            approx.column("gram").to_pylist(),
            approx.column("cnt").to_pylist(),
        )
    )
    assert got == exact


def test_cms_estimates_are_one_sided(ray_session):
    """Without re-count the CMS estimate never undercounts."""
    import ray

    from uk_address_matcher_ray.stages.ngram_topk import (
        ngram_topk,
        ngram_topk_approx,
    )

    tbl = pa.table(
        {
            "lang": pa.array(["en"] * 50, pa.string()),
            "text": pa.array(
                [f"alpha beta gamma delta tok{i}" for i in range(50)], pa.string()
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    exact = {
        (r["g"], r["gram"]): r["cnt"]
        for r in ngram_topk(ds, 100, n=2).take_all()
    }
    approx = ngram_topk_approx(ds, 100, n=2, recount=False)
    for g, gram, cnt in zip(
        approx.column("g").to_pylist(),
        approx.column("gram").to_pylist(),
        approx.column("cnt").to_pylist(),
    ):
        assert cnt >= exact[(g, gram)]
