"""Gap-based sessionization: the streaming-window aggregate a training-data
event pipeline needs (per-user activity sessions).

``sessionize``: rows of one key sorted by (ts, tiebreak) split into
sessions wherever the gap to the previous row EXCEEDS ``gap`` (strict >,
matching the SQL `lag` formulation); one output row per session with
integer-exact aggregates. ONE key-hash exchange (grouped_map complete
groups) + a fully vectorized kernel: lexsort, boundary flags, cumsum
session ids, ``np.add.reduceat`` per-session sums.

Money sums aggregate AND OUTPUT as integer cents (round(value*100) per
row, summed as int64) so the result is order-independent and bit-identical
to the DuckDB oracle — same convention as events_hourly.

Partitioning assumption: one key's rows co-locate (hash exchange); a hot
key means a hot TASK, not a hot partition, and cannot be salted (session
boundaries need the whole timeline).  When a single key can exceed a
worker's heap, use ``sessionize_chunked`` — identical output with NO
complete-group contract: global (key, ts) range sort, per-block local
sessions, and an O(blocks) driver boundary walk carrying the one open
session (sessionization is a prefix scan, so that is the entire
cross-block state).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def sessionize(
    ds,
    *,
    key: str,
    ts: str,
    gap: int,
    value: Optional[str] = None,
    tiebreak: Optional[str] = None,
    num_partitions: Optional[int] = None,
):
    """-> Dataset of (key, session_id, session_start, session_end,
    n_events[, sum_value_cents]) — session_id is 1-based per key in time
    order.

    ``gap``: same unit as the int64-cast ``ts`` (microseconds for Arrow
    timestamps). ``value``: optional money column summed as integer cents.
    ``tiebreak``: column ordering equal timestamps deterministically."""
    schema = ds.schema()
    fields = dict(zip(schema.names, schema.types))
    ts_type = fields[ts]

    out_fields = [
        pa.field(key, fields[key]),
        pa.field("session_id", pa.int64()),
        pa.field("session_start", ts_type),
        pa.field("session_end", ts_type),
        pa.field("n_events", pa.int64()),
    ]
    if value is not None:
        out_fields.append(pa.field("sum_value_cents", pa.int64()))
    out_schema = pa.schema(out_fields)

    def kernel(tbl: pa.Table) -> pa.Table:
        return _sessions_local(
            tbl, key, ts, gap, value, tiebreak, out_schema
        )

    from uk_address_matcher_ray.stages.grouped import grouped_map

    return grouped_map(
        ds, key, None, out_schema, fn_table=kernel,
        num_partitions=num_partitions,
    )


def _sessions_local(
    tbl: pa.Table,
    key: str,
    ts: str,
    gap: int,
    value,
    tiebreak,
    out_schema: pa.Schema,
) -> pa.Table:
    """Sessionize one table (any key mix): lexsort, boundary flags,
    reduceat aggregates; per-key 1-based ids local to this table."""
    n = tbl.num_rows
    if n == 0:
        return out_schema.empty_table()
    kcol = tbl.column(key)
    karr = (
        kcol.to_numpy(zero_copy_only=False)
        if pa.types.is_integer(kcol.type)
        else np.asarray(kcol.to_pylist(), dtype=object)
    )
    tarr = tbl.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    if tiebreak is not None:
        tb = tbl.column(tiebreak).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, tarr, karr))
    else:
        order = np.lexsort((tarr, karr))
    k_s, t_s = karr[order], tarr[order]
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = k_s[1:] != k_s[:-1]
    new_sess = new_key.copy()
    new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap
    starts = np.flatnonzero(new_sess)
    counts = np.diff(np.append(starts, n))
    # 1-based session id per key: session ordinal minus the ordinal of
    # the key's first session
    sess_ord = np.arange(len(starts), dtype=np.int64)
    key_first = np.maximum.accumulate(
        np.where(new_key[starts], sess_ord, -1)
    )
    sid = sess_ord - key_first + 1
    ends = starts + counts - 1
    cols = [
        kcol.take(pa.array(order[starts], pa.int64())).combine_chunks(),
        pa.array(sid, pa.int64()),
        tbl.column(ts).take(pa.array(order[starts], pa.int64())).combine_chunks(),
        tbl.column(ts).take(pa.array(order[ends], pa.int64())).combine_chunks(),
        pa.array(counts.astype(np.int64), pa.int64()),
    ]
    if value is not None:
        v = tbl.column(value).cast(pa.float64()).to_numpy(zero_copy_only=False)
        cents = np.rint(v * 100.0).astype(np.int64)[order]
        sums = np.add.reduceat(cents, starts)
        cols.append(pa.array(sums, pa.int64()))
    return pa.Table.from_arrays(cols, schema=out_schema)


def _session_merge_plan(metas, gap: int, has_value: bool):
    """Driver-side boundary merge over per-block metadata (O(blocks)).

    ``metas[i]`` (None for empty blocks): dict with first_key, last_key,
    first_row_ts, last_row_ts, n_sessions, first_sess (dict of the
    block's FIRST session row: id/start/end/n[/cents]), last_sess
    (likewise; equal to first_sess when n_sessions == 1).

    Returns (plans, flushed):
    * ``plans[i]`` = (off, drop_first, drop_last) — add ``off`` to the
      session ids of rows whose key == first_key; drop the boundary rows
      the driver re-emits (every block's LAST session is withheld as the
      open carry; the FIRST is also dropped when it merged into the
      carry).
    * ``flushed`` = list of completed session dicts (id/key/start/end/
      n[/cents]) — at most one per block plus the final carry, so the
      driver state is block-count-bounded.

    A session is a gap-split prefix scan, so the only cross-block state
    is the open last session (its aggregates + the last ROW timestamp);
    blocks merge when the same key continues within ``gap``.
    """
    plans = []
    flushed = []
    carry = None  # open session dict + "_last_row_ts"
    for meta in metas:
        if meta is None:
            plans.append(None)
            continue
        fk, lk = meta["first_key"], meta["last_key"]
        merged = (
            carry is not None
            and carry["key"] == fk
            and (meta["first_row_ts"] - carry["_last_row_ts"]) <= gap
        )
        if merged:
            off = carry["id"] - 1
        elif carry is not None and carry["key"] == fk:
            off = carry["id"]
        else:
            off = 0
        single = meta["n_sessions"] == 1
        if merged:
            # combine carry + the block's first session
            carry["end"] = meta["first_sess"]["end"]
            carry["n"] += meta["first_sess"]["n"]
            if has_value:
                carry["cents"] += meta["first_sess"]["cents"]
            if single:
                # the open session continues past this block
                carry["_last_row_ts"] = meta["last_row_ts"]
                plans.append((off, True, True))
                continue
            flushed.append({k: v for k, v in carry.items() if k != "_last_row_ts"})
            carry = None
        elif carry is not None:
            flushed.append({k: v for k, v in carry.items() if k != "_last_row_ts"})
            carry = None
        # withhold the block's last session as the new open carry
        last = dict(meta["last_sess"])
        last["key"] = lk
        if lk == fk:
            last["id"] += off
        last["_last_row_ts"] = meta["last_row_ts"]
        carry = last
        plans.append((off, merged, True))
    if carry is not None:
        flushed.append({k: v for k, v in carry.items() if k != "_last_row_ts"})
    return plans, flushed


def sessionize_chunked(
    ds,
    *,
    key: str,
    ts: str,
    gap: int,
    value: Optional[str] = None,
    tiebreak: Optional[str] = None,
):
    """Hot-key-safe ``sessionize``: identical output, NO complete-group
    contract — one key's rows may span any number of blocks.

    Shape: global range sort by (key, ts[, tiebreak]) (Ray's sort splits
    a giant key across bounded blocks), per-block local sessionize (task
    wave), then an O(blocks) driver boundary walk that carries the ONE
    open session across block edges (sessionization is a prefix scan —
    the only cross-block state is the open session's aggregates and the
    last row timestamp). Memory per task is one block; driver state is
    block-count-bounded. Use this path when a single key can exceed a
    worker's heap (the ``sessionize`` docstring's stated limit).
    """
    import ray

    schema = ds.schema()
    fields = dict(zip(schema.names, schema.types))
    ts_type = fields[ts]
    out_fields = [
        pa.field(key, fields[key]),
        pa.field("session_id", pa.int64()),
        pa.field("session_start", ts_type),
        pa.field("session_end", ts_type),
        pa.field("n_events", pa.int64()),
    ]
    if value is not None:
        out_fields.append(pa.field("sum_value_cents", pa.int64()))
    out_schema = pa.schema(out_fields)
    has_value = value is not None

    cols = [key, ts]
    if tiebreak is not None:
        cols.append(tiebreak)
    if value is not None:
        cols.append(value)
    sort_keys = [key, ts] + ([tiebreak] if tiebreak is not None else [])
    sorted_ds = ds.select_columns(cols).sort(sort_keys)
    refs = sorted_ds.to_arrow_refs()

    def _sess_dict(local: pa.Table, i: int) -> dict:
        d = {
            "key": local.column(key)[i].as_py(),
            "id": local.column("session_id")[i].as_py(),
            "start": local.column("session_start")[i].as_py(),
            "end": local.column("session_end")[i].as_py(),
            "n": local.column("n_events")[i].as_py(),
        }
        if has_value:
            d["cents"] = local.column("sum_value_cents")[i].as_py()
        return d

    @ray.remote(num_returns=2)
    def block_sessions(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None, None
        local = _sessions_local(
            tbl, key, ts, gap, value, tiebreak, out_schema
        )
        meta = {
            "first_key": local.column(key)[0].as_py(),
            "last_key": local.column(key)[-1].as_py(),
            "first_row_ts": tbl.column(ts)
            .cast(pa.int64())[0]
            .as_py(),
            "last_row_ts": tbl.column(ts)
            .cast(pa.int64())[-1]
            .as_py(),
            "n_sessions": local.num_rows,
            "first_sess": _sess_dict(local, 0),
            "last_sess": _sess_dict(local, -1),
        }
        return local, meta

    local_refs = []
    meta_refs = []
    for r in refs:
        lr, mr = block_sessions.remote(r)
        local_refs.append(lr)
        meta_refs.append(mr)
    metas = ray.get(meta_refs)
    plans, flushed = _session_merge_plan(metas, gap, has_value)

    @ray.remote
    def fixup(local: pa.Table, plan) -> pa.Table:
        off, drop_first, drop_last = plan
        lo = 1 if drop_first else 0
        hi = local.num_rows - (1 if drop_last else 0)
        out = local.slice(lo, max(0, hi - lo))
        if off and out.num_rows:
            import pyarrow.compute as pc

            fk_val = local.column(key)[0]
            mask = pc.equal(out.column(key), fk_val)
            sid = pc.add(
                out.column("session_id"),
                pc.if_else(mask, pa.scalar(off, pa.int64()), pa.scalar(0, pa.int64())),
            )
            out = out.set_column(
                out.schema.get_field_index("session_id"),
                "session_id",
                sid.cast(pa.int64()),
            )
        return out

    out_refs = [
        fixup.remote(lr, plan)
        for lr, plan in zip(local_refs, plans)
        if plan is not None
    ]
    # driver re-emits the withheld boundary sessions (block-count-bounded)
    fcols = {
        key: pa.array([f["key"] for f in flushed], fields[key]),
        "session_id": pa.array([f["id"] for f in flushed], pa.int64()),
        "session_start": pa.array([f["start"] for f in flushed], ts_type),
        "session_end": pa.array([f["end"] for f in flushed], ts_type),
        "n_events": pa.array([f["n"] for f in flushed], pa.int64()),
    }
    if has_value:
        fcols["sum_value_cents"] = pa.array(
            [f["cents"] for f in flushed], pa.int64()
        )
    flush_tbl = pa.table(fcols).cast(out_schema)
    out_refs.append(ray.put(flush_tbl))
    return ray.data.from_arrow_refs(out_refs)


def rolling_window(
    ds,
    *,
    key: str,
    ts: str,
    window: int,
    value: str,
    id_col: str,
    num_partitions: Optional[int] = None,
):
    """Time-RANGE rolling aggregate per key — SQL's
    ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW``.

    For every event: the count and integer-cents sum of ``value`` over the
    SAME key's events with ``ts`` in ``[ts_i - window, ts_i]`` (inclusive
    both ends, ALL timestamp peers included — exactly DuckDB's RANGE frame,
    verified tie semantics).  ``window`` is in the int64-cast ``ts`` unit
    (microseconds for Arrow timestamps).

    Shape: ONE key-hash exchange (grouped_map complete groups), then a
    fully vectorized kernel — lexsort by (key, ts), frame bounds by two
    ``np.searchsorted`` calls over a segment-offset composite (each key's
    timestamps shifted onto a disjoint int64 range so one global binary
    search answers every per-key window; falls back to a per-key loop if
    the composite would overflow int64), frame sums as prefix-sum
    differences.  Money rides as integer cents (events_hourly convention)
    so results are order-independent and bit-identical to the oracle.

    Partitioning assumption: one key's rows co-locate.  A hot key is a hot
    task; unlike sessionize the ROLLING frame is local in time, so a hot
    key CAN be split into time-chunks with a ``window``-wide halo — noted
    for the 100 TB path, not engaged at test scale.
    """
    schema = ds.schema()
    fields = dict(zip(schema.names, schema.types))
    out_schema = pa.schema(
        [
            pa.field(id_col, fields[id_col]),
            pa.field(key, fields[key]),
            pa.field(ts, fields[ts]),
            pa.field("roll_n", pa.int64()),
            pa.field("roll_cents", pa.int64()),
        ]
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table()
        kcol = tbl.column(key)
        karr = (
            kcol.to_numpy(zero_copy_only=False)
            if pa.types.is_integer(kcol.type)
            else np.asarray(kcol.to_pylist(), dtype=object)
        )
        tarr = tbl.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((tarr, karr))
        k_s, t_s = karr[order], tarr[order]
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = k_s[1:] != k_s[:-1]
        seg = np.cumsum(new_key) - 1
        tmin = int(t_s.min())
        span = int(t_s.max()) - tmin
        period = span + window + 1
        nseg = int(seg[-1]) + 1
        if nseg * period < (1 << 62):
            t_norm = (t_s - tmin) + seg * period
            lo = np.searchsorted(t_norm, t_norm - window, side="left")
            hi = np.searchsorted(t_norm, t_norm, side="right")
        else:  # pragma: no cover - needs a >4000-year ts span
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(new_key)
            ends = np.append(starts[1:], n)
            for a, b in zip(starts, ends):
                lo[a:b] = a + np.searchsorted(
                    t_s[a:b], t_s[a:b] - window, side="left"
                )
                hi[a:b] = a + np.searchsorted(
                    t_s[a:b], t_s[a:b], side="right"
                )
        v = tbl.column(value).cast(pa.float64()).to_numpy(zero_copy_only=False)
        cents = np.rint(v * 100.0).astype(np.int64)[order]
        cum = np.concatenate([[0], np.cumsum(cents)])
        take = pa.array(order, pa.int64())
        return pa.Table.from_arrays(
            [
                tbl.column(id_col).take(take).combine_chunks(),
                kcol.take(take).combine_chunks(),
                tbl.column(ts).take(take).combine_chunks(),
                pa.array(hi - lo, pa.int64()),
                pa.array(cum[hi] - cum[lo], pa.int64()),
            ],
            schema=out_schema,
        )

    from uk_address_matcher_ray.stages.grouped import grouped_map

    return grouped_map(
        ds, key, None, out_schema, fn_table=kernel,
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# Latest event per key (grouped argmax)
# ---------------------------------------------------------------------------

def latest_events(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
):
    """The most recent event per key -> Dataset(key, event_id,
    event_type, us) — the grouped-argmax primitive ("current state per
    user/url/entity", the keep-newest half of snapshot dedup as a
    standalone op).

    Contract (mirrored by ``latest_events_sql``): the winner per key is
    the maximum ``(epoch_us(ts), event_id)`` — the unique id breaks
    timestamp ties deterministically.

    Scale shape: per-batch partial argmax (one row per key per batch —
    the max of a batch is the only batch row that can win globally), so
    the single grouped exchange carries keys x batches rows, never the
    events; the group kernel re-applies the same argmax over complete
    keys.  Skew-immune: a hot key costs one row per upstream batch.
    """
    import pyarrow.compute as pc

    from uk_address_matcher_ray.stages.grouped import grouped_map

    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    out_schema = pa.schema(
        [
            pa.field(key_col, key_type),
            pa.field("event_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("us", pa.int64()),
        ]
    )

    def argmax_kernel(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl,
            sort_keys=[
                (key_col, "ascending"),
                ("us", "descending"),
                ("event_id", "descending"),
            ],
        )
        s = tbl.take(order)
        keys = s.column(key_col).to_pylist()
        keep = [i == 0 or keys[i] != keys[i - 1] for i in range(len(keys))]
        return s.filter(pa.array(keep))

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "event_id": batch.column(id_col).cast(pa.int64()),
                "event_type": batch.column(type_col),
                "us": batch.column(ts_col)
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )
        return argmax_kernel(t)

    pre = ds.select_columns(
        [key_col, id_col, type_col, ts_col]
    ).map_batches(partial, batch_format="pyarrow")
    return grouped_map(pre, key_col, None, out_schema,
                       fn_table=argmax_kernel)


def latest_events_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> str:
    """DuckDB mirror: row_number over (us DESC, id DESC)."""
    return f"""
WITH ev AS (
    SELECT {key_col}, {id_col} AS event_id, {type_col} AS event_type,
           epoch_us({ts_col}) AS us,
           row_number() OVER (
               PARTITION BY {key_col}
               ORDER BY epoch_us({ts_col}) DESC, {id_col} DESC) AS rn
    FROM {table}
)
SELECT {key_col}, event_id, event_type, us FROM ev WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Ordered timeline assembly (grouped ordered string_agg)
# ---------------------------------------------------------------------------

def user_timelines(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
):
    """Per-key ordered event-type timeline -> Dataset(key, n_events,
    timeline) — the transcript/trajectory assembly step (user behavior
    strings for sequence mining, conversation reconstruction from
    interaction logs).

    Contract (mirrored by ``user_timelines_sql``): events order by
    ``(epoch_us(ts), event_id)`` (the repo-wide event tie-break);
    ``timeline`` is the ``sep``-joined event types in that order.

    Scale shape: one grouped exchange carrying (key, type, us, id);
    the kernel sorts complete keys.  Timeline strings are produced AT
    the group — nothing longer than a row's own timeline ever rides a
    shuffle.  Pathologically long keys cost their own sort only.
    """
    from uk_address_matcher_ray.stages.grouped import grouped_map

    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    out_schema = pa.schema(
        [
            pa.field(key_col, key_type),
            pa.field("n_events", pa.int64()),
            pa.field("timeline", pa.string()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                "ty": batch.column(type_col),
                "us": batch.column(ts_col)
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "eid": batch.column(id_col).cast(pa.int64()),
            }
        )

    def kernel(tbl: pa.Table) -> pa.Table:
        per: dict = {}
        for k, ty, us, eid in zip(
            tbl.column(key_col).to_pylist(),
            tbl.column("ty").to_pylist(),
            tbl.column("us").to_pylist(),
            tbl.column("eid").to_pylist(),
        ):
            per.setdefault(k, []).append((us, eid, ty))
        keys = sorted(per)
        lines = []
        counts = []
        for k in keys:
            evs = per[k]
            evs.sort()
            lines.append(sep.join(t for _, _, t in evs))
            counts.append(len(evs))
        return pa.table(
            {
                key_col: pa.array(keys, key_type),
                "n_events": pa.array(counts, pa.int64()),
                "timeline": pa.array(lines, pa.string()),
            }
        )

    pre = ds.select_columns(
        [key_col, type_col, ts_col, id_col]
    ).map_batches(prep, batch_format="pyarrow")
    return grouped_map(pre, key_col, None, out_schema, fn_table=kernel)


def user_timelines_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
) -> str:
    """DuckDB mirror: ordered string_agg with the same tie-break."""
    from uk_address_matcher_ray.util import sql_str

    return f"""
SELECT {key_col},
       CAST(count(*) AS BIGINT) AS n_events,
       string_agg({type_col}, {sql_str(sep)}
                  ORDER BY epoch_us({ts_col}), {id_col}) AS timeline
FROM {table}
GROUP BY {key_col}
"""
