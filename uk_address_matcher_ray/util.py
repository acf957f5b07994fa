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
