"""Percent rank per group: RANK tie semantics, singles, oracle
parity, partition invariance."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.quantiles import (
    group_percent_rank,
    group_percent_rank_sql,
)


def _run(rows, parts=1):
    import ray

    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_chars": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = sorted(
        map(
            repr,
            group_percent_rank(ds, "n_chars", "source").take_all(),
        )
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = sorted(
        map(
            repr,
            con.sql(
                group_percent_rank_sql("n_chars", "source")
            ).arrow().to_pylist(),
        )
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_pct_rank_ties_and_singles():
    rows = [
        ("a", 10), ("a", 20), ("a", 20), ("a", 30), ("a", 40),
        ("solo", 7),
        ("b", 5), ("b", 5),
    ]
    out = _run(rows)
    # a: ranks 1,2,2,4,5 over n=5 -> pct 0, .25, .25, .75, 1
    # solo: 0.0; b: both tied at rank 1 -> 0.0, 0.0
    import json

    vals = {eval(r)["doc_id"]: eval(r)["pct_rank"] for r in out}
    assert vals[0] == 0.0 and vals[1] == 0.25 and vals[2] == 0.25
    assert vals[3] == 0.75 and vals[4] == 1.0
    assert vals[5] == 0.0 and vals[6] == 0.0 and vals[7] == 0.0
    assert _run(rows, parts=5) == out


@pytest.mark.usefixtures("ray_session")
def test_pct_rank_empty():
    assert _run([]) == []
