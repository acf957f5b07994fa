"""Batch-level grouped map: the per-group overhead killer.

``Dataset.groupby(k).map_groups(fn)`` invokes ``fn`` once per group — at
millions of tiny groups the per-call Python/Arrow overhead dominates wall
time. ``grouped_map`` provides the same semantics with per-BLOCK calls:

1. sort by the key (one range shuffle — map_groups does the same
   internally);
2. every sorted block processes all its COMPLETE groups in one task;
   leading/trailing rows whose key may straddle a block boundary are split
   off per block;
3. straddler repair exploits the sort's range partitioning: a key can only
   span ADJACENT blocks, so boundary tables are chained into runs (block i
   joins block i+1 iff i's trailing key == i+1's leading key) and each run's
   groups are complete within the run — processed by small independent tasks
   (batched to bound scheduling), with NO shuffle. This replaces the former
   ``groupby(key).map_groups`` repair pass, which cost a full all-to-all job
   for a handful of straddler rows.

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

# repair tasks process this many chained runs each — bounds task count
# without bounding data (a run is as big as its hottest straddling key)
_RUNS_PER_REPAIR_TASK = 32


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

    @ray.remote(num_returns=3)
    def split_block(tbl: pa.Table):
        if tbl.num_rows == 0:
            return out_schema.empty_table(), tbl, (None, None)
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
            return out_schema.empty_table(), tbl, (first_key, last_key)
        done = run_complete(tbl.slice(lead_end, trail_start - lead_end))
        boundary = pa.concat_tables(
            [tbl.slice(0, lead_end), tbl.slice(trail_start, n - trail_start)]
        )
        return done, boundary, (first_key, last_key)

    done_refs = []
    boundary_refs = []
    meta_refs = []
    for ref in refs:
        d, b, m = split_block.remote(ref)
        done_refs.append(d)
        boundary_refs.append(b)
        meta_refs.append(m)

    done_ds = ray.data.from_arrow_refs(done_refs)

    # chain adjacent boundary tables whose edge keys connect; every group is
    # complete within its run, so runs process independently
    metas = ray.get(meta_refs)
    chained = [
        (b, m) for b, m in zip(boundary_refs, metas) if m[0] is not None
    ]
    runs: List[List] = []
    for i, (b, m) in enumerate(chained):
        if runs and chained[i - 1][1][1] == m[0]:
            runs[-1].append(b)
        else:
            runs.append([b])

    @ray.remote
    def repair(*tbls):
        live = [t for t in tbls if t.num_rows > 0]
        if not live:
            return out_schema.empty_table()
        tbl = pa.concat_tables(live).combine_chunks()
        return run_complete(tbl.sort_by(key))

    repair_refs = []
    for start in range(0, len(runs), _RUNS_PER_REPAIR_TASK):
        batch = [b for run in runs[start : start + _RUNS_PER_REPAIR_TASK] for b in run]
        repair_refs.append(repair.remote(*batch))

    if not repair_refs:
        return done_ds
    fixed = ray.data.from_arrow_refs(repair_refs)
    return done_ds.union(fixed)
