"""Funnel conversion analysis over an event stream — for an ordered
list of steps (event types), how many users progress through each
prefix in strict temporal order.  The classic product-analytics
sequence query (and, for training pipelines, the shape of any
"did this session reach stage k" audit over interaction logs).

Contract (mirrored by ``funnel_sql``):

* events are ordered per user by ``(epoch_us(ts), event_id)`` — the
  unique event id breaks timestamp ties deterministically;
* greedy earliest matching: scan the user's ordered events, advance
  the step pointer whenever the event type equals the next step; one
  event matches at most one step.  Greedy-earliest maximizes the
  matched prefix (the standard exchange argument), and equals the SQL
  oracle's min-chaining (earliest step-1 event, then the earliest
  step-2 event strictly after it, ...);
* output: one row per step — ``step`` (1-based), ``step_name``,
  ``users`` = count of users whose matched prefix reaches that step.
  Steps are emitted even when ``users = 0``.

Scale shape: ONE grouped exchange keyed on ``user_id`` (the kernel
sees complete users and reduces each to a single small integer), then
a driver-side cumulative count over ``len(steps)`` values — driver
state is the step list, never the users.  A per-batch pre-filter drops
every event whose type is not in the funnel before the exchange, so
the all-to-all carries only funnel-relevant rows.
"""

from __future__ import annotations

from typing import List, Sequence

import pyarrow as pa

from uk_address_matcher_ray import util
import pyarrow.compute as pc


def funnel_conversions(
    events,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """-> Dataset(step, step_name, users) — one row per funnel step."""
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    steps = list(steps)
    step_set = set(steps)

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column(type_col),
            value_set=pa.array(sorted(step_set), pa.string()),
        )
        t = batch.filter(keep)
        return pa.table(
            {
                "u": t.column(user_col),
                "ty": t.column(type_col),
                "us": t.column(ts_col).cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "eid": t.column(id_col).cast(pa.int64()),
            }
        )

    skinny = events.select_columns(
        [user_col, type_col, ts_col, id_col]
    ).map_batches(prefilter, batch_format="pyarrow")

    reach_schema = pa.schema([pa.field("reached", pa.int64())])

    def reach_kernel(tbl: pa.Table) -> pa.Table:
        per: dict = {}
        for u, ty, us, eid in zip(
            tbl.column("u").to_pylist(),
            tbl.column("ty").to_pylist(),
            tbl.column("us").to_pylist(),
            tbl.column("eid").to_pylist(),
        ):
            per.setdefault(u, []).append((us, eid, ty))
        reached: List[int] = []
        for evs in per.values():
            evs.sort()
            ptr = 0
            for _, _, ty in evs:
                if ptr < len(steps) and ty == steps[ptr]:
                    ptr += 1
            reached.append(ptr)
        return pa.table({"reached": pa.array(reached, pa.int64())})

    per_user = grouped_map(skinny, "u", None, reach_schema,
                           fn_table=reach_kernel)
    counts = {
        int(r["reached"]): int(r["count()"])
        for r in per_user.groupby("reached").count().take_all()
    }
    users_at = []
    running = 0
    for k in range(len(steps), 0, -1):
        running += counts.get(k, 0)
        users_at.append((k, running))
    users_at.reverse()
    return ray.data.from_arrow(
        pa.table(
            {
                "step": pa.array([k for k, _ in users_at], pa.int64()),
                "step_name": pa.array(
                    [steps[k - 1] for k, _ in users_at], pa.string()
                ),
                "users": pa.array([c for _, c in users_at], pa.int64()),
            }
        )
    )


def funnel_sql(
    steps: Sequence[str],
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB mirror: min-chained struct keys, one CTE per step."""
    steps = list(steps)
    key = f"struct_pack(us := ev.us, id := ev.{id_col})"
    parts = [
        f"""ev AS (
    SELECT {user_col} AS u, {type_col} AS ty,
           epoch_us({ts_col}) AS us, {id_col}
    FROM {table}
)""",
        f"""m1 AS (
    SELECT ev.u, min({key}) AS k
    FROM ev WHERE ev.ty = {util.sql_str(steps[0])} GROUP BY ev.u
)""",
    ]
    for i in range(2, len(steps) + 1):
        parts.append(
            f"""m{i} AS (
    SELECT ev.u, min({key}) AS k
    FROM ev JOIN m{i - 1} p ON p.u = ev.u
    WHERE ev.ty = {util.sql_str(steps[i - 1])} AND {key} > p.k
    GROUP BY ev.u
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, {util.sql_str(steps[i - 1])} AS step_name,"
        f" (SELECT count(*) FROM m{i}) AS users"
        for i in range(1, len(steps) + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects
