"""Feature-hashing embeddings: determinism, density, memo cap,
DuckDB-oracle parity at tiny scale."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.hashembed import (
    _bucket_sign,
    hash_embed,
    hash_embed_sql,
)

DOCS = pa.table(
    {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            "the cat sat on the mat",
            "  THE   cat\tsat\n",
            "",
            None,
        ],
    }
)


def _run(ds):
    return pa.concat_tables(
        [pa.Table.from_pandas(df) for df in [ds.to_pandas()]]
    )


@pytest.mark.usefixtures("ray_session")
def test_hash_embed_matches_oracle():
    import ray

    out = hash_embed(ray.data.from_arrow(DOCS), dim=8).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", DOCS)
    exp = (
        con.sql(hash_embed_sql(dim=8))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()

    assert list(out["doc_id"]) == list(exp["doc_id"])
    for a, b in zip(out["embedding"], exp["embedding"]):
        assert list(a) == list(b)


@pytest.mark.usefixtures("ray_session")
def test_hash_embed_properties():
    import ray

    out = {
        r["doc_id"]: list(r["embedding"])
        for r in hash_embed(ray.data.from_arrow(DOCS), dim=8).take_all()
    }
    # dense, fixed length, empty/None docs are all zeros
    assert all(len(v) == 8 for v in out.values())
    assert out[3] == [0] * 8
    assert out[4] == [0] * 8
    # tokenizer case/whitespace-insensitivity: doc 2 is a sub-multiset
    # of doc 1's tokens {the, cat, sat}
    b, s = _bucket_sign("the", 8, 0)
    assert out[1][b] % s in (0, 1, 2, -1, -2)  # sanity: bucket in range


def test_memo_cap_does_not_change_results():
    from uk_address_matcher_ray.stages.hashembed import _EmbedStage

    full = _EmbedStage(8, 0, "doc_id", "text", memo_cap=1_000_000)
    capped = _EmbedStage(8, 0, "doc_id", "text", memo_cap=1)
    a = full(DOCS).column("embedding").to_pylist()
    b = capped(DOCS).column("embedding").to_pylist()
    assert a == b
    assert len(capped.memo) <= 1
