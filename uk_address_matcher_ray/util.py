"""Small Dataset utilities."""

from __future__ import annotations

import os
import time

import pyarrow as pa


_STAGE_MEMO: dict = {}


def memo_stage(key, builder):
    """Per-worker-process stage memo for TASK-based ``map_batches``.

    Task-based map_batches re-runs captured constructors per task;
    memoizing the built stage on (broadcast-ref hex, params) gives
    actor-pool-style once-per-worker setup without paying actor-pool
    spawn latency (~1-3 s/stage on a fresh session — the round-2
    finding, now the repo-wide convention for stateful stages whose
    state derives from a broadcast ref)."""
    st = _STAGE_MEMO.get(key)
    if st is None:
        st = builder()
        if len(_STAGE_MEMO) > 32:
            _STAGE_MEMO.clear()
        _STAGE_MEMO[key] = st
    return st


def sql_str(s: str) -> str:
    """Render ``s`` as a standard SQL string literal (quote doubling).

    DuckDB single-quoted literals treat backslashes literally (verified:
    ``SELECT 'a\\b'`` -> ``a\\b``), so doubling ``'`` is the complete
    escape for ANY content — use this everywhere a Python string is
    interpolated into generated oracle SQL.
    """
    return "'" + s.replace("'", "''") + "'"


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


# --- in-task phase timers (measurement of record for the raw-task phases
# Dataset.stats() cannot see) -------------------------------------------------
#
# Off by default (GRAFT_TIMERS unset: `timed` is a no-op context manager with
# zero per-call actor traffic). When GRAFT_TIMERS=1, every `with timed("x")`
# in ANY worker process fire-and-forgets (seconds, 1 call) to a named
# detached collector actor; the driver reads totals with `timer_report()`.
# Phase seconds are summed ACROSS workers, i.e. CPU-seconds of in-task wall
# time, not pipeline wall time — use them for attribution, not as
# end-to-end timings.

_TIMERS_ON = bool(os.environ.get("GRAFT_TIMERS"))
_TIMER_HANDLE: list = [None]


class timed:
    __slots__ = ("phase", "t0")

    def __init__(self, phase: str):
        self.phase = phase

    def __enter__(self):
        if _TIMERS_ON:
            self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        if _TIMERS_ON:
            dt = time.monotonic() - self.t0
            actor = _timer_actor(create=True)
            actor.add.remote({self.phase: (dt, 1)})
        return False


def _timer_actor(create: bool = False):
    import ray

    if _TIMER_HANDLE[0] is not None:
        return _TIMER_HANDLE[0]
    try:
        actor = ray.get_actor("graft_timers", namespace="graft")
    except ValueError:
        if not create:
            return None

        @ray.remote(num_cpus=0)
        class _Collector:
            def __init__(self):
                self.acc = {}

            def add(self, phases: dict):
                for k, (s, c) in phases.items():
                    s0, c0 = self.acc.get(k, (0.0, 0))
                    self.acc[k] = (s0 + s, c0 + c)

            def report(self):
                return dict(self.acc)

            def reset(self):
                self.acc = {}

        try:
            # job-scoped (NOT detached): the collector is only ever read by
            # the driver of the same job, and a detached named actor would
            # leak and accumulate totals across separate runs on one cluster
            actor = _Collector.options(
                name="graft_timers", namespace="graft"
            ).remote()
        except ValueError:  # lost the creation race to another worker
            actor = ray.get_actor("graft_timers", namespace="graft")
    _TIMER_HANDLE[0] = actor
    return actor


def timer_report(reset: bool = False) -> dict:
    """Driver-side: {phase: (seconds_across_workers, calls)}."""
    import ray

    actor = _timer_actor(create=True)
    out = ray.get(actor.report.remote())
    if reset:
        ray.get(actor.reset.remote())
    return {k: (round(s, 3), c) for k, (s, c) in sorted(out.items())}
