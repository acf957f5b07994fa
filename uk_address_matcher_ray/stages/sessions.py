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
boundaries need the whole timeline).
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

    from uk_address_matcher_ray.stages.grouped import grouped_map

    return grouped_map(
        ds, key, None, out_schema, fn_table=kernel,
        num_partitions=num_partitions,
    )


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
