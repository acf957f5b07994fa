"""User-extension surface: composable cleaning queues (SURVEY.md §2.12).

The reference's pipeline-step API is an ordered list of
``(relation, con) -> relation`` callables folded by ``run_pipeline``
(cleaning/run_pipeline.py:6-48). The Ray-native equivalent: an ordered list
of ``pyarrow.Table -> pyarrow.Table`` transforms fused into ONE
``map_batches`` stage (steps are row-local, so fusion is free and avoids a
task boundary per step).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import pyarrow as pa

BatchTransform = Callable[[pa.Table], pa.Table]


def fuse(steps: Sequence[BatchTransform]) -> BatchTransform:
    def fused(batch: pa.Table) -> pa.Table:
        for step in steps:
            batch = step(batch)
        return batch

    return fused


def run_pipeline(ds, steps: Sequence[BatchTransform], *, batch_size: int = 4096):
    """Fold an ordered queue of batch transforms over a Dataset (one fused
    map_batches; mirrors the reference's run_pipeline semantics)."""
    return ds.map_batches(
        fuse(list(steps)), batch_format="pyarrow", batch_size=batch_size
    )


def column_step(
    fn: Callable[[list], list], in_col: str, out_col: str | None = None, out_type=None
) -> BatchTransform:
    """Lift a python-list column function into a BatchTransform."""

    def step(batch: pa.Table) -> pa.Table:
        vals = fn(batch.column(in_col).to_pylist())
        arr = pa.array(vals, type=out_type)
        name = out_col or in_col
        if name in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index(name), name, arr
            )
        return batch.append_column(name, arr)

    return step
