"""Small Dataset utilities."""

from __future__ import annotations

import pyarrow as pa


def dataset_from_table(tbl: pa.Table, target_blocks: int | None = None):
    """ray.data.from_arrow with the table pre-split into multiple blocks.

    A single from_arrow() call yields ONE block, which caps every downstream
    map_batches at one task; splitting up front unlocks the actor pools.
    """
    import ray

    if target_blocks is None:
        target_blocks = max(2, int(ray.cluster_resources().get("CPU", 4)) * 2)
    n = tbl.num_rows
    if n == 0:
        return ray.data.from_arrow(tbl)
    chunk = max(1, (n + target_blocks - 1) // target_blocks)
    slices = [tbl.slice(i, chunk) for i in range(0, n, chunk)]
    return ray.data.from_arrow(slices)


_BROADCAST_MEMO: dict = {}


def get_broadcast(ref_or_value):
    """Resolve a ``ray.put`` broadcast ref with a per-worker-process memo.

    Task-based ``map_batches`` re-deserializes captured objects per task;
    shipping a tiny ObjectRef in the closure and memoizing the first
    ``ray.get`` per worker gives actor-pool-style once-per-worker setup
    without paying actor-pool spawn latency (~3 s/stage on a fresh session).
    Plain values (tests constructing stages directly) pass through.
    """
    import ray

    if not isinstance(ref_or_value, ray.ObjectRef):
        return ref_or_value
    key = ref_or_value.hex()
    val = _BROADCAST_MEMO.get(key)
    if val is None:
        val = ray.get(ref_or_value)
        if len(_BROADCAST_MEMO) > 64:
            _BROADCAST_MEMO.clear()
        _BROADCAST_MEMO[key] = val
    return val
