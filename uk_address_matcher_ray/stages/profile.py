"""Generic column profiler — the first query any data engineer runs on
an unfamiliar 100 TB table: per column, row count, null count and exact
distinct count.

Contract (mirrored by ``profile_columns_sql``): one output row per
profiled column — ``column_name``, ``n_rows`` (table rows), ``n_nulls``,
``n_distinct`` (exact, nulls excluded — COUNT(DISTINCT col) semantics).

Scale shape:

* nulls/rows: per-batch integer partials, one skinny groupby;
* distinct: each batch emits its DISTINCT values as 60-bit hashes of a
  canonical encoding (``repr`` of the Python value — injective for the
  int/string/float columns this targets), keyed ``col:hex`` — so the
  exchange carries one ~25-byte row per (batch, distinct value), never
  the values themselves, and the global distinct count is a groupby
  over hashes.  The hash never needs SQL mirroring: only the COUNT is
  compared against the oracle.  A 60-bit collision would undercount by
  one (P < n²/2^61 — negligible, and stated).  At corpus scale where
  even the hash exchange is too wide, the approximate path is the
  existing HLL sketch (stages/hll.py) — same pass shape, constant
  exchange.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H


def profile_columns(ds, columns: Optional[Sequence[str]] = None):
    """-> Dataset(column_name, n_rows, n_nulls, n_distinct)."""
    import ray

    cols: List[str] = list(columns or ds.schema().names)
    assert all(":" not in c for c in cols), "column names must not contain ':'"

    def null_partial(batch: pa.Table) -> pa.Table:
        names, n, nulls = [], [], []
        for c in cols:
            names.append(c)
            n.append(batch.num_rows)
            nulls.append(batch.column(c).null_count)
        return pa.table(
            {
                "column_name": pa.array(names, pa.string()),
                "n": pa.array(n, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
            }
        )

    # per-batch partials are |cols| rows each — combine on the driver
    # (a Dataset groupby here cost a whole job's fixed overhead)
    null_tbls = [
        t
        for t in ray.get(
            ds.select_columns(cols)
            .map_batches(null_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    counts = {}
    if null_tbls:
        agg = (
            pa.concat_tables(null_tbls)
            .group_by("column_name")
            .aggregate([("n", "sum"), ("nulls", "sum")])
        )
        counts = {
            c.as_py(): (int(n.as_py()), int(u.as_py()))
            for c, n, u in zip(
                agg.column("column_name"),
                agg.column("n_sum"),
                agg.column("nulls_sum"),
            )
        }

    def distinct_partial(batch: pa.Table) -> pa.Table:
        keys = set()
        for c in cols:
            for v in batch.column(c).drop_null().unique().to_pylist():
                keys.add(f"{c}:{H.h60(repr(v)):x}")
        return pa.table({"k": pa.array(sorted(keys), pa.string())})

    def col_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.list_element(
            pc.split_pattern(batch.column("k").combine_chunks(), ":"), 0
        )
        return pa.table(
            {
                "column_name": col,
                "d": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )

    def col_counts(batch: pa.Table) -> pa.Table:
        # per-block (column, distinct-count) partial — |cols| rows
        t = col_of(batch)
        return (
            t.group_by("column_name")
            .aggregate([("d", "sum")])
            .rename_columns(["column_name", "d"])
        )

    d_tbls = [
        t
        for t in ray.get(
            ds.select_columns(cols)
            .map_batches(distinct_partial, batch_format="pyarrow")
            .groupby("k")
            .count()
            .map_batches(col_counts, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    distinct = {}
    if d_tbls:
        agg = (
            pa.concat_tables(d_tbls)
            .group_by("column_name")
            .aggregate([("d", "sum")])
        )
        distinct = {
            c.as_py(): int(v.as_py())
            for c, v in zip(
                agg.column("column_name"), agg.column("d_sum")
            )
        }

    return ray.data.from_arrow(
        pa.table(
            {
                "column_name": pa.array(cols, pa.string()),
                "n_rows": pa.array(
                    [counts.get(c, (0, 0))[0] for c in cols], pa.int64()
                ),
                "n_nulls": pa.array(
                    [counts.get(c, (0, 0))[1] for c in cols], pa.int64()
                ),
                "n_distinct": pa.array(
                    [distinct.get(c, 0) for c in cols], pa.int64()
                ),
            }
        )
    )


def profile_columns_sql(
    columns: Sequence[str], table: str = "documents"
) -> str:
    """DuckDB mirror: one UNION ALL branch per column."""
    branches = [
        f"""SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM {table}"""
        for c in columns
    ]
    return "\nUNION ALL\n".join(branches)
