"""shuffle_shards — deterministic training-data shuffle/shard export."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.shards import shuffle_shards, shuffle_shards_sql


def _tbl(n):
    return pa.table({"doc_id": pa.array(list(range(n)), pa.int64())})


@pytest.mark.usefixtures("ray_session")
def test_shuffle_shards_vs_oracle_and_properties():
    import ray

    n, S = 500, 7
    ds = ray.data.from_arrow(_tbl(n)).repartition(5)
    got = shuffle_shards(ds, num_shards=S, seed=3).take_all()

    con = duckdb.connect()
    con.register("documents", _tbl(n))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(shuffle_shards_sql(S, seed=3)).fetchall()
    }
    assert len(got) == n
    for r in got:
        assert want[r["doc_id"]] == (r["sample_key"], r["shard"], r["pos"])

    # dense positions 0..n_s-1 per shard; every shard non-pathological
    by_shard: dict = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(S))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))

    # deterministic across runs / partitionings
    again = shuffle_shards(
        ray.data.from_arrow(_tbl(n)).repartition(2), num_shards=S, seed=3
    ).take_all()
    assert sorted(map(repr, again)) == sorted(map(repr, got))

    # seed changes the permutation
    other = shuffle_shards(ds, num_shards=S, seed=4).take_all()
    assert {r["doc_id"]: r["shard"] for r in other} != {
        r["doc_id"]: r["shard"] for r in got
    }
