"""Driver-contract simulation: run every ``queries()`` entry at sf0.001 and
compare against its ``oracle_sql()`` through DuckDB — row count, schema
(column names) and order-insensitive values — exactly the driver's
CORRECTNESS gate shape."""

from __future__ import annotations

import json
import math
import os

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_arrow(res) -> pa.Table:
    import ray

    if isinstance(res, ray.data.Dataset):
        tables = ray.get(res.to_arrow_refs())
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            schema = res.schema()
            return pa.schema(
                [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
            ).empty_table()
        return pa.concat_tables(nonempty, promote_options="permissive")
    if isinstance(res, pa.Table):
        return res
    return pa.Table.from_pandas(res)


def _canon_rows(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    rows = []
    for row in tbl.select(cols).to_pylist():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = f"{v!r}"
            elif isinstance(v, (list, dict)):
                v = json.dumps(v, sort_keys=True, default=repr)
            vals.append((c, v))
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


@pytest.mark.usefixtures("ray_session")
def test_queries_match_oracles():
    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not available")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, sql in oracles.items():
        ray_tbl = _to_arrow(qs[name](SF_DIR))
        orc_tbl = con.sql(sql).arrow()
        if ray_tbl.num_rows != orc_tbl.num_rows:
            failures.append(
                f"{name}: rows {ray_tbl.num_rows} vs oracle {orc_tbl.num_rows}"
            )
            continue
        if sorted(ray_tbl.column_names) != sorted(orc_tbl.column_names):
            failures.append(
                f"{name}: cols {sorted(ray_tbl.column_names)} vs "
                f"{sorted(orc_tbl.column_names)}"
            )
            continue
        a, b = _canon_rows(ray_tbl), _canon_rows(orc_tbl)
        if a != b:
            diff = [
                (x, y) for x, y in zip(a, b) if x != y
            ][:2]
            failures.append(f"{name}: value mismatch, first diffs: {diff}")
    con.close()
    assert not failures, "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run():
    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not available")
    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        tbl = _to_arrow(qs[name](SF_DIR))
        assert tbl.num_rows >= 0, name
