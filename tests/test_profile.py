"""Column profiler: oracle parity across types, nulls, empties,
partition invariance."""

import duckdb
import pyarrow as pa
import pytest

from uk_address_matcher_ray.stages.profile import (
    profile_columns,
    profile_columns_sql,
)


def _check(t, cols):
    import ray

    out = (
        profile_columns(ray.data.from_arrow(t), cols)
        .to_pandas()
        .sort_values("column_name")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("tt", t)
    exp = (
        con.sql(profile_columns_sql(cols, "tt"))
        .df()
        .sort_values("column_name")
        .reset_index(drop=True)
    )
    con.close()
    assert out.equals(exp[out.columns])
    return out


@pytest.mark.usefixtures("ray_session")
def test_profile_mixed_types():
    t = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 3], pa.int64()),
            "b": pa.array(["x", None, "x", "y", None], pa.string()),
            "c": pa.array([1.5, 1.5, None, 2.5, float("inf")], pa.float64()),
        }
    )
    out = _check(t, ["a", "b", "c"])
    by = out.set_index("column_name")
    assert by.loc["a"].to_dict() == {
        "n_rows": 5, "n_nulls": 1, "n_distinct": 3
    }
    assert by.loc["b", "n_distinct"] == 2


@pytest.mark.usefixtures("ray_session")
def test_profile_empty_and_all_null():
    t = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.string()),
        }
    )
    out = _check(t, ["a", "b"])
    assert (out["n_rows"] == 0).all() and (out["n_distinct"] == 0).all()

    t2 = pa.table({"a": pa.array([None, None], pa.int64())})
    out2 = _check(t2, ["a"])
    assert out2.iloc[0].to_dict() == {
        "column_name": "a", "n_rows": 2, "n_nulls": 2, "n_distinct": 0
    }


@pytest.mark.usefixtures("ray_session")
def test_profile_partition_invariance():
    import ray

    vals = list(range(50)) * 3
    t = pa.table({"a": pa.array(vals, pa.int64())})
    one = profile_columns(ray.data.from_arrow(t), ["a"]).take_all()
    many = profile_columns(
        ray.data.from_arrow(t).repartition(13), ["a"]
    ).take_all()
    assert one == many
    assert one[0]["n_distinct"] == 50
