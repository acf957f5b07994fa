"""Batch-level grouped map: the per-group overhead killer.

``Dataset.groupby(k).map_groups(fn)`` invokes ``fn`` once per group — at
millions of tiny groups the per-call Python/Arrow overhead dominates wall
time. ``grouped_map`` provides the same semantics with per-BLOCK calls:

1. sort by the key (one range shuffle — map_groups does the same
   internally);
2. every sorted block processes all its COMPLETE groups in one task;
   leading/trailing rows whose key may straddle a block boundary are split
   off as block outputs that stay in the object store;
3. the straddler rows (≤ 2 keys per block) go through one tiny
   ``groupby(key).map_groups`` repair pass; outputs union.

Two callable modes:

* ``fn_rows``: maps the row-dicts of ONE group to output row-dicts (simple,
  Python-object path);
* ``fn_table``: receives a pyarrow.Table containing one or more COMPLETE
  groups sorted by the key and returns an output table — the vectorized
  path (no per-row Python objects; used by the pair scorer).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import pyarrow as pa


def grouped_map(
    ds,
    key: str,
    fn_rows: Optional[Callable[[List[dict]], List[dict]]],
    out_schema: pa.Schema,
    fn_table: Optional[Callable[[pa.Table], pa.Table]] = None,
):
    import ray

    sorted_ds = ds.sort(key).materialize()
    refs = sorted_ds.to_arrow_refs()

    def run_complete(tbl: pa.Table) -> pa.Table:
        if fn_table is not None:
            return fn_table(tbl)
        out_rows: List[dict] = []
        group: List[dict] = []
        gkey = None
        for r in tbl.to_pylist():
            if gkey is not None and r[key] != gkey:
                out_rows.extend(fn_rows(group))
                group = []
            gkey = r[key]
            group.append(r)
        if group:
            out_rows.extend(fn_rows(group))
        return pa.Table.from_pylist(out_rows, schema=out_schema)

    @ray.remote(num_returns=2)
    def split_block(tbl: pa.Table):
        if tbl.num_rows == 0:
            return out_schema.empty_table(), tbl
        keys = tbl.column(key).to_pylist()
        first_key, last_key = keys[0], keys[-1]
        n = len(keys)
        lead_end = 0
        while lead_end < n and keys[lead_end] == first_key:
            lead_end += 1
        trail_start = n
        while trail_start > 0 and keys[trail_start - 1] == last_key:
            trail_start -= 1
        if trail_start < lead_end:  # whole block is one key -> all boundary
            return out_schema.empty_table(), tbl
        done = run_complete(tbl.slice(lead_end, trail_start - lead_end))
        boundary = pa.concat_tables(
            [tbl.slice(0, lead_end), tbl.slice(trail_start, n - trail_start)]
        )
        return done, boundary

    done_refs = []
    boundary_refs = []
    for ref in refs:
        d, b = split_block.remote(ref)
        done_refs.append(d)
        boundary_refs.append(b)

    done_ds = ray.data.from_arrow_refs(done_refs)

    def fix_group(group: pa.Table) -> pa.Table:
        return run_complete(group)

    boundary_ds = ray.data.from_arrow_refs(boundary_refs)
    fixed = boundary_ds.groupby(key).map_groups(fix_group, batch_format="pyarrow")
    return done_ds.union(fixed)
