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
