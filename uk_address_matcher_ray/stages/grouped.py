"""Batch-level grouped map: the per-group overhead killer.

``Dataset.groupby(k).map_groups(fn)`` invokes ``fn`` once per group — at
millions of tiny groups the per-call Python/Arrow overhead dominates wall
time. ``grouped_map`` provides the same semantics with per-BLOCK calls, via
one of two exchanges:

* **hash** (small inputs): a raw-task map-reduce exchange. Every
  materialized block splits into P hash partitions (deterministic
  ``crc32(key) % P``); each partition task concatenates its pieces, sorts
  locally by the key and processes ALL its groups — complete by
  construction, so there is no boundary repair, no global sample pass, and
  no Dataset all-to-all job. Wins while per-job fixed cost dominates; its
  all-splits-before-any-process barrier loses to the sort's pipelining on
  big inputs, so it is row-count-gated. (Ray Data has no hash-partition
  primitive: the experimental HASH_SHUFFLE context reserves aggregator
  actors that starve small sessions — measured, see NOTES.md — so this
  drops to raw tasks deliberately.)
* **sort** (big inputs): global ``Dataset.sort`` + per-block processing of
  complete groups + adjacency-chained straddler repair (a key can only span
  ADJACENT blocks of a range-partitioned sort).

Two callable modes:

* ``fn_rows``: maps the row-dicts of ONE group to output row-dicts (simple,
  Python-object path);
* ``fn_table``: receives a pyarrow.Table containing one or more COMPLETE
  groups sorted by the key and returns an output table — the vectorized
  path (no per-row Python objects; used by the pair scorer).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import pyarrow as pa

KeyArg = Union[str, Sequence[str]]


def _key_list(key: KeyArg) -> List[str]:
    return [key] if isinstance(key, str) else list(key)


def _bucket_codes(tbl: pa.Table, keys: List[str], P: int):
    """Deterministic partition id per row. String keys hash via polars'
    vectorized 64-bit hash; integer (pre-hashed) keys are already uniform,
    so the primary key modulo P suffices — all rows of a composite key share
    the primary, hence the partition."""
    import numpy as np

    col = tbl.column(keys[0])
    if pa.types.is_integer(col.type):
        return (
            col.to_numpy(zero_copy_only=False).astype(np.uint64) % P
        ).astype(np.int64)
    try:
        import polars as pl

        s = pl.Series("k", col.to_pylist(), dtype=pl.Utf8)
        return (s.hash(seed=0).to_numpy() % P).astype(np.int64)
    except ImportError:  # pragma: no cover
        import zlib

        ks = col.to_pylist()
        return np.fromiter(
            (zlib.crc32(str(k).encode()) % P for k in ks),
            dtype=np.int64,
            count=len(ks),
        )

# repair tasks process this many chained runs each — bounds task count
# without bounding data (a run is as big as its hottest straddling key)
_RUNS_PER_REPAIR_TASK = 32

# hash exchange creates B_eff×P intermediate objects; input-block bundling
# (B_eff <= ~2 tasks/CPU) and row-scaled P keep this bounded at a few
# thousand regardless of upstream block count

# the hash exchange wins when per-job fixed cost dominates (small inputs: it
# replaces sample+map+reduce sort jobs with two raw task waves) but its
# all-splits-before-any-process barrier and B×P tiny split objects forfeit
# the sort's pipelining on big inputs — measured (32 cpus, rescore payload)
# 1.5x FASTER at 0.7M rows, 3x SLOWER at 2.7M rows.
# Default: hash below this row count, Dataset sort above.
_HASH_EXCHANGE_MAX_ROWS = 1_000_000


def _make_run_complete(keys: List[str], fn_rows, fn_table, out_schema):
    def run_complete(tbl: pa.Table) -> pa.Table:
        if fn_table is not None:
            return fn_table(tbl)
        out_rows: List[dict] = []
        group: List[dict] = []
        gkey = None
        for r in tbl.to_pylist():
            rkey = tuple(r[k] for k in keys)
            if gkey is not None and rkey != gkey:
                out_rows.extend(fn_rows(group))
                group = []
            gkey = rkey
            group.append(r)
        if group:
            out_rows.extend(fn_rows(group))
        return pa.Table.from_pylist(out_rows, schema=out_schema)

    return run_complete


def grouped_map(
    ds,
    key: KeyArg,
    fn_rows: Optional[Callable[[List[dict]], List[dict]]],
    out_schema: pa.Schema,
    fn_table: Optional[Callable[[pa.Table], pa.Table]] = None,
    num_partitions: Optional[int] = None,
    rows_hint: Optional[int] = None,
):
    import ray

    keys = _key_list(key)
    run_complete = _make_run_complete(keys, fn_rows, fn_table, out_schema)

    # ``rows_hint``: callers that can bound the input size up front (e.g.
    # blocking knows rows ≈ cleaned_count × avg emissions) let big inputs
    # stream STRAIGHT into the Dataset sort — the input materialize below
    # exists only to choose the exchange and feed the raw-task hash path,
    # and for sort-path inputs it is a pure pessimization (a barrier plus
    # one extra full write+read of the input through the object store).
    if rows_hint is not None and rows_hint > _HASH_EXCHANGE_MAX_ROWS:
        return _grouped_map_sort(ds, keys, run_complete, out_schema)

    materialized = ds.materialize()
    refs = materialized.to_arrow_refs()
    B = len(refs)
    if B == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_rows = materialized.count()
    if num_partitions is not None:
        P = num_partitions
    else:
        # partition granularity ≈ ~4k rows per process task (kernel-slice
        # sized), at least one task wave across the cluster
        P = max(8, cpus, min(-(-n_rows // 4096), 4 * cpus))

    if n_rows > _HASH_EXCHANGE_MAX_ROWS:
        return _grouped_map_sort(materialized, keys, run_complete, out_schema)

    sort_spec = [(k, "ascending") for k in keys]

    # bundle input blocks so the split wave stays ~2 tasks/CPU: the exchange
    # creates B_eff x P intermediate objects, and many small upstream blocks
    # (e.g. slice-level outputs of a previous grouped_map) would otherwise
    # explode the object count and raylet overhead
    bundle_n = max(1, -(-B // max(8, 2 * cpus)))
    bundles = [refs[i : i + bundle_n] for i in range(0, B, bundle_n)]
    B_eff = len(bundles)

    @ray.remote
    def split(*tbls):
        live = [
            t
            for t in tbls
            if t.num_rows > 0 and keys[0] in t.schema.names
        ]
        if not live:
            return tuple([None] * P)
        import numpy as np

        tbl = live[0] if len(live) == 1 else pa.concat_tables(live)
        buckets = _bucket_codes(tbl, keys, P)
        out = []
        for p in range(P):
            idx = np.nonzero(buckets == p)[0]
            out.append(tbl.take(pa.array(idx)) if len(idx) else None)
        return tuple(out)

    parts = [split.options(num_returns=P).remote(*b) for b in bundles]

    @ray.remote
    def process(*tbls):
        live = [t for t in tbls if t is not None and t.num_rows > 0]
        if not live:
            return out_schema.empty_table()
        tbl = pa.concat_tables(live).combine_chunks()
        return run_complete(tbl.sort_by(sort_spec))

    proc_refs = [
        process.remote(*[parts[b][p] for b in range(B_eff)]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(proc_refs)


def _grouped_map_sort(
    ds_in, keys: List[str], run_complete, out_schema: pa.Schema
):
    """Sort-exchange fallback: global range sort + complete-group blocks +
    adjacency-chained straddler repair.

    Ray's sample-based range sort produces UNEVEN blocks (measured up to
    ~4x the mean), and the kernel runs per block — one oversized block
    pins the whole stage's wall time. So the kernel is decoupled from the
    block granularity: a cheap probe wave finds key-aligned cut points in
    each sorted block, then one kernel task per SLICE reads the shared
    block from the object store zero-copy and processes its complete-group
    range. Slices are sized so roughly 4 waves of tasks cover the cluster,
    bounding the straggler at ~1/(4·cpus) of the stage."""
    import ray

    import os as _os
    import time as _time

    _dbg = _os.environ.get("GRAFT_GM_DEBUG") == "1"
    _t0 = _time.monotonic()

    # ``ds_in`` may be LAZY (rows_hint fast path): the sort then pipelines
    # with the upstream map stage; row count reads from the sorted result's
    # metadata rather than re-executing the input.
    sorted_ds = ds_in.sort(keys if len(keys) > 1 else keys[0]).materialize()
    if _dbg:
        print(f"[gm {keys}] sort {_time.monotonic()-_t0:.2f}s", flush=True)
        _t0 = _time.monotonic()
    refs = sorted_ds.to_arrow_refs()
    sort_spec = [(k, "ascending") for k in keys]
    import os

    cpus = int(ray.cluster_resources().get("CPU", 8))
    total_rows = sorted_ds.count()
    target = max(2048, total_rows // max(1, 4 * cpus))
    if os.environ.get("GRAFT_NO_SLICE") == "1":  # A/B diagnosis knob
        target = 1 << 62

    @ray.remote
    def probe(tbl: pa.Table):
        """(n, first_key, last_key, interior key-aligned cut offsets)."""
        if tbl.num_rows == 0:
            return 0, None, None, []
        import numpy as np

        arrs = [tbl.column(k).to_numpy(zero_copy_only=False) for k in keys]
        n = tbl.num_rows
        first_key = tuple(a[0] for a in arrs)
        last_key = tuple(a[-1] for a in arrs)
        neq_first = arrs[0] != first_key[0]
        neq_last = arrs[0] != last_key[0]
        for a, f, l in zip(arrs[1:], first_key[1:], last_key[1:]):
            neq_first |= a != f
            neq_last |= a != l
        lead_end = int(neq_first.argmax()) if neq_first.any() else n
        trail_start = n - int(neq_last[::-1].argmax()) if neq_last.any() else 0
        if trail_start < lead_end:  # whole block is one key -> all boundary
            return n, first_key, last_key, []
        # key-change positions inside the interior; cut at the first key
        # boundary at or after each multiple of target
        neq_prev = arrs[0][1:] != arrs[0][:-1]
        for a in arrs[1:]:
            neq_prev |= a[1:] != a[:-1]
        bounds = np.flatnonzero(neq_prev) + 1
        bounds = bounds[(bounds > lead_end) & (bounds < trail_start)]
        cuts = [lead_end]
        if len(bounds):
            idx = np.searchsorted(
                bounds, np.arange(lead_end + target, trail_start, target)
            )
            for pos in bounds[idx[idx < len(bounds)]]:
                p = int(pos)
                if p > cuts[-1]:
                    cuts.append(p)
        cuts.append(trail_start)
        return n, first_key, last_key, cuts

    metas = ray.get([probe.remote(r) for r in refs])
    if _dbg:
        print(f"[gm {keys}] probe {_time.monotonic()-_t0:.2f}s", flush=True)
        _t0 = _time.monotonic()

    @ray.remote
    def process_slice(tbl: pa.Table, start: int, end: int):
        return run_complete(tbl.slice(start, end - start))

    @ray.remote
    def boundary_slice(tbl: pa.Table, lead_end: int, trail_start: int):
        n = tbl.num_rows
        return pa.concat_tables(
            [tbl.slice(0, lead_end), tbl.slice(trail_start, n - trail_start)]
        )

    done_refs = []
    boundary_refs = []
    block_metas = []
    for ref, (n, first_key, last_key, cuts) in zip(refs, metas):
        if n == 0:
            continue
        block_metas.append((first_key, last_key))
        if not cuts:  # whole block is one key
            boundary_refs.append(ref)
            continue
        for s, e in zip(cuts[:-1], cuts[1:]):
            if e > s:
                done_refs.append(process_slice.remote(ref, s, e))
        boundary_refs.append(boundary_slice.remote(ref, cuts[0], cuts[-1]))

    if not done_refs:
        done_ds = ray.data.from_arrow(out_schema.empty_table())
    else:
        done_ds = ray.data.from_arrow_refs(done_refs)

    # chain adjacent boundary tables whose edge keys connect; every group is
    # complete within its run, so runs process independently
    chained = list(zip(boundary_refs, block_metas))
    # Adjacency chaining relies on to_arrow_refs() returning the range-sorted
    # blocks in global key order — a documented-nowhere Ray Data invariant.
    # Verify it: block key ranges must be non-decreasing in ref order. If it
    # ever breaks, fragments of a straddling key could land in separate runs
    # and be silently processed as two complete groups — so fall back to ONE
    # global repair task over every boundary table (correct for any order,
    # since ranges from a range-partition sort are disjoint).
    monotonic = all(
        chained[i - 1][1][1] <= chained[i][1][0] for i in range(1, len(chained))
    )
    if monotonic:
        runs: List[List] = []
        for i, (b, m) in enumerate(chained):
            if runs and chained[i - 1][1][1] == m[0]:
                runs[-1].append(b)
            else:
                runs.append([b])
    else:
        runs = [[b for b, _m in chained]] if chained else []

    @ray.remote
    def repair(*tbls):
        live = [t for t in tbls if t.num_rows > 0]
        if not live:
            return out_schema.empty_table()
        tbl = pa.concat_tables(live).combine_chunks()
        return run_complete(tbl.sort_by(sort_spec))

    repair_refs = []
    for start in range(0, len(runs), _RUNS_PER_REPAIR_TASK):
        batch = [b for run in runs[start : start + _RUNS_PER_REPAIR_TASK] for b in run]
        repair_refs.append(repair.remote(*batch))

    if _dbg:
        ray.wait(done_refs + repair_refs, num_returns=len(done_refs) + len(repair_refs))
        print(
            f"[gm {keys}] kernels+repair {_time.monotonic()-_t0:.2f}s "
            f"({len(done_refs)} slices, {len(repair_refs)} repairs)",
            flush=True,
        )
    if not repair_refs:
        return done_ds
    fixed = ray.data.from_arrow_refs(repair_refs)
    return done_ds.union(fixed)
