"""Integer-exact grouped z-score outliers: hand-computed cases, oracle
parity, degenerate groups."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.moments import (
    grouped_outliers,
    grouped_outliers_sql,
)


def _run(rows, z=3):
    import ray

    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_chars": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    out = sorted(
        r["doc_id"]
        for r in grouped_outliers(
            ray.data.from_arrow(t), "n_chars", "source", z=z
        ).take_all()
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = sorted(
        r["doc_id"]
        for r in con.sql(
            grouped_outliers_sql("n_chars", "source", z=z)
        ).arrow().to_pylist()
    )
    con.close()
    assert out == exp
    return out


@pytest.mark.usefixtures("ray_session")
def test_single_extreme_value_is_flagged():
    rows = [("a", 100)] * 20 + [("a", 100000)] + [("b", 5)] * 3
    out = _run(rows)
    assert out == [20]  # only the 100000 doc


@pytest.mark.usefixtures("ray_session")
def test_uniform_and_singleton_groups_have_no_outliers():
    rows = [("a", 7)] * 10 + [("solo", 999)]
    assert _run(rows) == []


@pytest.mark.usefixtures("ray_session")
def test_z_controls_strictness():
    # one moderately-far value: flagged at z=1, not at z=3
    rows = [("a", 10), ("a", 10), ("a", 10), ("a", 10), ("a", 14)]
    assert _run(rows, z=3) == []
    loose = _run(rows, z=1)
    assert 4 in loose


@pytest.mark.usefixtures("ray_session")
def test_empty_input():
    assert _run([]) == []
