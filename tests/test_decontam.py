"""Benchmark decontamination (stages/decontam.py): known-overlap cases,
the filter variant, short-doc edges, and the driver-query oracle at a
small synthetic scale."""

import duckdb
import pyarrow as pa

from uk_address_matcher_ray.stages.decontam import (
    benchmark_ngram_assets,
    decontaminate,
)


def _mk(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_flag_and_filter(ray_session):
    import ray

    bench = ray.data.from_arrow(
        _mk([(100, "alpha beta gamma delta epsilon"), (101, "one two three")])
    )
    corpus_rows = [
        (0, "xx alpha beta gamma yy"),  # shares 3-gram "alpha beta gamma"
        (1, "alpha beta zeta gamma"),  # no shared 3-gram
        (2, "one two three"),  # whole doc is a benchmark 3-gram
        (3, "one two"),  # too short for any 3-gram
        (4, None),
        (5, ""),
    ]
    corpus = ray.data.from_arrow(_mk(corpus_rows))
    assets = benchmark_ngram_assets(bench, k=3)
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, ray.put(assets), k=3).take_all()
    }
    assert flags == {0: True, 1: False, 2: True, 3: False, 4: False, 5: False}
    kept = decontaminate(
        corpus, ray.put(assets), k=3, flag_only=False
    ).take_all()
    assert sorted(r["doc_id"] for r in kept) == [1, 3, 4, 5]
    # original columns survive the filter variant
    assert {"doc_id", "text"} <= set(kept[0])


def test_empty_benchmark(ray_session):
    import ray

    corpus = ray.data.from_arrow(_mk([(0, "a b c d e")]))
    assets = benchmark_ngram_assets(
        ray.data.from_arrow(_mk([(9, "x")])), k=3
    )
    assert assets[0].shape == (0,)
    out = decontaminate(corpus, ray.put(assets), k=3).take_all()
    assert out == [{"doc_id": 0, "contaminated": False}]


def test_driver_query_oracle(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(3)
    vocab = ["data", "the", "merge", "x", "scan", "agg", "row"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 25)))
        for _ in range(120)
    ]
    docs = _mk(list(enumerate(texts)))
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")
    tbl = pa.Table.from_pylist(
        e.queries()["decontaminate_docs"](str(sf)).take_all()
    ).sort_by("doc_id")
    con = duckdb.connect()
    con.register("documents", docs)
    ora = (
        con.execute(e.oracle_sql()["decontaminate_docs"])
        .fetch_arrow_table()
        .sort_by("doc_id")
    )
    assert tbl.num_rows == ora.num_rows
    assert tbl.column("doc_id").to_pylist() == ora.column("doc_id").to_pylist()
    assert (
        tbl.column("contaminated").to_pylist()
        == ora.column("contaminated").to_pylist()
    )
    # small vocab at k=4 must produce real variance
    flags = set(tbl.column("contaminated").to_pylist())
    assert flags == {True, False}
